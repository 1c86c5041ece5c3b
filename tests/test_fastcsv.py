"""fastcsv must be byte-identical to DataFrame.to_csv(index=False).

The droplet CSV artifacts are the reference's pandas output
(quantify_droplets_batch.py:61-63,163-167); the fast writer may only ever
differ by being faster. Property-checked across the pipeline's real column
types plus adversarial values; anything outside the proven envelope must
return None (pandas fallback), never wrong bytes.
"""

import io

import numpy as np
import pandas as pd
import pytest

from unetdc_tpu.io.fastcsv import to_csv_bytes, write_csv


def _pandas_bytes(df) -> bytes:
    buf = io.StringIO()
    df.to_csv(buf, index=False)
    return buf.getvalue().encode("utf-8")


def _assert_matches(df):
    got = to_csv_bytes(df)
    assert got is not None, "frame unexpectedly outside the fast envelope"
    assert got == _pandas_bytes(df)


def _droplet_frame(rng, n, px_per_um=None, fname="image15.png"):
    area = rng.integers(1, 5000, n)
    df = pd.DataFrame({
        "label": np.arange(1, n + 1, dtype=np.int64),
        "area": area.astype(np.int64),
        "equivalent_diameter": np.sqrt(4.0 * area.astype(np.float64) / np.pi),
        "centroid-0": rng.random(n) * 512,
        "centroid-1": rng.random(n) * 512,
    })
    df.insert(0, "filename", fname)
    if px_per_um is not None:
        df["area_sqmicron"] = df["area"] / (px_per_um ** 2)
        df["eq_diam_micron"] = df["equivalent_diameter"] / px_per_um
    return df


@pytest.mark.parametrize("n", [0, 1, 3, 217, 1500])
@pytest.mark.parametrize("px", [None, 3.45])
def test_droplet_schema_parity(n, px):
    rng = np.random.default_rng(n + 1)
    _assert_matches(_droplet_frame(rng, n, px))


def test_summary_schema_parity():
    df = pd.DataFrame([
        {"filename": "a.png", "droplet_count": 292, "total_area_px": 37660},
        {"filename": "b.png", "droplet_count": 0, "total_area_px": 0},
    ])
    _assert_matches(df)


def test_adversarial_floats():
    vals = [0.0, -0.0, 1.0, 0.1, 1 / 3, 1e-8, 1e16, 1.23456789012345e17,
            2.5, 0.30000000000000004, np.pi, 5e-324, 1.7976931348623157e308,
            np.inf, -np.inf, np.nan]
    _assert_matches(pd.DataFrame({"x": np.array(vals), "y": 1}))
    # NaN as the row's only field quotes as "" — the csv-module rule
    _assert_matches(pd.DataFrame({"x": np.array([np.nan, 1.5])}))


def test_random_float_fuzz():
    rng = np.random.default_rng(0)
    # bit-pattern floats: exercise subnormals/extremes of the repr path
    bits = rng.integers(0, 2 ** 64, 2000, dtype=np.uint64)
    vals = bits.view(np.float64)
    vals = vals[np.isfinite(vals)]  # NaN payloads all format as '' anyway
    _assert_matches(pd.DataFrame({"x": vals}))


def test_string_quoting():
    s = ["plain", "comma,inside", 'quote"inside', "new\nline", "cr\rhere",
         "", "trailing,", '"',  "ünïcode µm"]
    _assert_matches(pd.DataFrame({"filename": s, "n": np.arange(len(s))}))
    # single string column: empty field quoting rule
    _assert_matches(pd.DataFrame({"filename": s}))


def test_header_quoting_and_ints_bools():
    df = pd.DataFrame({"a,b": [1, 2], 'q"c': np.array([3, 4], np.int32),
                       "flag": [True, False],
                       "u": np.array([5, 6], np.uint8)})
    _assert_matches(df)


def test_fallbacks_return_none():
    assert to_csv_bytes(pd.DataFrame()) is None
    assert to_csv_bytes(pd.DataFrame({"x": np.array([1.5], np.float32)})) is None
    assert to_csv_bytes(pd.DataFrame({"x": [object()]})) is None
    dup = pd.DataFrame(np.ones((2, 2)), columns=["a", "a"])
    assert to_csv_bytes(dup) is None


def test_write_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    df = _droplet_frame(rng, 50, px_per_um=2.0)
    p = tmp_path / "fast.csv"
    write_csv(p, df)
    q = tmp_path / "pandas.csv"
    df.to_csv(q, index=False)
    assert p.read_bytes() == q.read_bytes()
    # fallback path writes via pandas
    f32 = pd.DataFrame({"x": np.array([1.5, 2.5], np.float32)})
    p2 = tmp_path / "fb.csv"
    write_csv(p2, f32)
    assert p2.read_bytes() == _pandas_bytes(f32)
