"""Unit tests for scripts/conformance.py's value canonicalization —
the hash must be row-order insensitive and dtype-tolerant the same way
the driver's compare is (sorted columns, integral floats == ints)."""

import importlib.util
import os

import pandas as pd

spec = importlib.util.spec_from_file_location(
    "conformance", os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "conformance.py"))
conf = importlib.util.module_from_spec(spec)
spec.loader.exec_module(conf)


def test_hash_row_order_insensitive():
    a = pd.DataFrame({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    b = pd.DataFrame({"k": [3, 1, 2], "v": ["z", "x", "y"]})
    assert conf._canon_hash(a) == conf._canon_hash(b)


def test_hash_column_order_insensitive():
    a = pd.DataFrame({"k": [1], "v": [2]})
    b = pd.DataFrame({"v": [2], "k": [1]})
    assert conf._canon_hash(a) == conf._canon_hash(b)


def test_hash_integral_float_equals_int():
    a = pd.DataFrame({"s": pd.array([299511, 42], dtype="int64")})
    b = pd.DataFrame({"s": pd.array([299511.0, 42.0], dtype="float64")})
    assert conf._canon_hash(a) == conf._canon_hash(b)


def test_hash_distinguishes_values():
    a = pd.DataFrame({"s": [1.5]})
    b = pd.DataFrame({"s": [1.6]})
    assert conf._canon_hash(a) != conf._canon_hash(b)


def test_hash_nan_stable():
    a = pd.DataFrame({"s": [float("nan"), 1.0]})
    b = pd.DataFrame({"s": [float("nan"), 1.0]})
    assert conf._canon_hash(a) == conf._canon_hash(b)
