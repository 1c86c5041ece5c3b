"""Byte-level schema parity with the reference's committed golden outputs
(/root/reference/outputs/*.csv): headers, column order, float formatting
style, and stats-file layout must match so downstream consumers of the
reference's CSVs can switch without changes."""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN = "/root/reference/outputs"

pytestmark = pytest.mark.skipif(not os.path.isdir(GOLDEN),
                                reason="reference outputs not mounted")


def _make_outputs(tmp_path):
    from unetdc_tpu.pipelines.quantify_batch import props_to_dataframe

    s0 = np.array([2505596, 21, 420])
    s1 = np.array([592640, 14, 168])
    props = {
        "area": np.array([18224, 7, 42]),
        "sum-0-lo": s0 & 255, "sum-0-hi": s0 >> 8,
        "sum-1-lo": s1 & 255, "sum-1-hi": s1 >> 8,
    }  # hi keys provided here; the small-image device path omits them
    df = props_to_dataframe(props, 3, px_per_um=3.45)
    df.insert(0, "filename", "image15.png")
    return df


def test_all_droplets_header_and_float_format(tmp_path):
    golden_header = open(f"{GOLDEN}/all_droplets.csv").readline().strip()
    df = _make_outputs(tmp_path)
    out = tmp_path / "all_droplets.csv"
    df.to_csv(out, index=False)
    ours_lines = out.read_text().splitlines()
    assert ours_lines[0] == golden_header
    # float cells use full repr like the golden file (no padding/rounding)
    golden_row = open(f"{GOLDEN}/all_droplets.csv").readlines()[1].split(",")
    ours_row = ours_lines[1].split(",")
    assert len(ours_row) == len(golden_row)
    # area formatted as int, floats with many significant digits
    assert ours_row[2] == "18224"
    assert "." in ours_row[3] and len(ours_row[3]) > 8


def test_summary_header():
    golden = open(f"{GOLDEN}/summary_per_image.csv").readline().strip()
    df = pd.DataFrame([{"filename": "x.png", "droplet_count": 1,
                        "total_area_px": 2}])
    assert ",".join(df.columns) == golden


def test_stats_file_layout(tmp_path):
    golden_lines = open(f"{GOLDEN}/droplet_size_stats.csv").read().splitlines()
    df = _make_outputs(tmp_path)
    stats = df["eq_diam_micron"].describe()[["mean", "50%", "std"]].rename(
        {"50%": "median"})
    out = tmp_path / "droplet_size_stats.csv"
    stats.to_csv(out)
    ours_lines = out.read_text().splitlines()
    assert ours_lines[0] == golden_lines[0] == ",eq_diam_micron"
    assert [l.split(",")[0] for l in ours_lines[1:]] == \
        [l.split(",")[0] for l in golden_lines[1:]] == ["mean", "median",
                                                        "std"]


def test_derived_px_per_micron_consistency():
    """Golden area_sqmicron / eq_diam_micron columns are self-consistent
    with a single px_per_micron; our formulas reproduce them exactly."""
    g = pd.read_csv(f"{GOLDEN}/all_droplets.csv")
    ppm = np.sqrt((g["area"] / g["area_sqmicron"]).iloc[0])
    np.testing.assert_allclose(g["area_sqmicron"], g["area"] / ppm ** 2,
                               rtol=1e-9)
    np.testing.assert_allclose(g["eq_diam_micron"],
                               g["equivalent_diameter"] / ppm, rtol=1e-9)
    np.testing.assert_allclose(
        g["equivalent_diameter"], np.sqrt(4 * g["area"] / np.pi), rtol=1e-12)
