from pararealml_tpu.operators.symbol_mapper import SymbolMapper

__all__ = ["SymbolMapper"]
