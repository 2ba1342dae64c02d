"""Sphinx configuration for pararealml_tpu."""

project = "pararealml_tpu"
copyright = "2026, pararealml_tpu developers"
author = "pararealml_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
html_theme = "alabaster"
autodoc_member_order = "bysource"
