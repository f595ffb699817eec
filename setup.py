"""Setuptools shim: all metadata lives in pyproject.toml. This file
exists so environments whose setuptools predates a vendored `wheel`
(< 70, where PEP 660 editable builds need the separate wheel package)
can still `pip install -e . --no-use-pep517` via the legacy develop
path."""

from setuptools import setup

setup()
