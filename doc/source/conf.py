# Sphinx configuration (equivalent of the reference's doc/source/conf.py).
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "specinv_tpu"
author = "specinv_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
]
autodoc_mock_imports = ["jax", "jaxlib", "optax", "numpy"]
html_theme = "sphinx_rtd_theme"
master_doc = "index"
