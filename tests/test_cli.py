"""CLI flag parity + GUI command-builder tests."""

import pytest


def test_batch_cli_flags_match_reference():
    """Every reference flag (quantify_droplets_batch.py:101-127) must exist
    with the same default."""
    from unetdc_tpu.cli.quantify_droplets_batch import build_parser

    p = build_parser()
    defaults = {a.dest: a.default for a in p._actions}
    assert defaults["ckpt_path"] == "best_UNetDC_focal_model.pth"
    assert defaults["out_dir"] == "quant_results"
    assert defaults["batch"] == 8
    assert defaults["prob_thresh"] == 0.3
    assert defaults["min_area"] == 1
    assert defaults["px_per_micron"] is None
    assert defaults["save_overlays"] is False
    assert defaults["background_radius"] == 50
    assert defaults["skip_excel"] is False
    assert defaults["skip_histogram"] is False
    args = p.parse_args(["--img_dir", "x", "--save_overlays", "--skip_excel"])
    assert args.save_overlays and args.skip_excel


def test_quantify_cli_flags_match_reference():
    """quantify.py:116-128 flag surface."""
    from unetdc_tpu.cli.quantify import build_parser

    p = build_parser()
    defaults = {a.dest: a.default for a in p._actions}
    assert defaults["out_dir"] == "quanti_results"
    assert defaults["kernel_size"] == 55
    assert defaults["nb_layers"] == 3
    assert defaults["contour_thresh"] == 0
    assert defaults["contour_min_size"] == 20
    # px_per_micron is required in the reference
    with pytest.raises(SystemExit):
        p.parse_args(["--img_dir", "x"])


def test_quantify_pipline_cli_flags():
    from unetdc_tpu.cli.quantify_pipline import build_parser

    p = build_parser()
    defaults = {a.dest: a.default for a in p._actions}
    assert defaults["out_dir"] == "quantify_results"
    assert defaults["prob_thresh"] == 0.3


def test_train_cli_defaults():
    from unetdc_tpu.cli.train import build_parser as bp1
    from unetdc_tpu.cli.train_dc_focal import build_parser as bp2

    d1 = {a.dest: a.default for a in bp1()._actions}
    assert d1["epochs"] == 50 and d1["patience"] == 10  # train.py
    d2 = {a.dest: a.default for a in bp2()._actions}
    assert d2["epochs"] == 15 and d2["patience"] == 5  # train_DC_focal.py
    assert d2["focal_ratio"] == 0.3
    assert d2["lr"] == 1e-3


def test_gui_command_builder():
    from unetdc_tpu.gui.command import build_batch_command

    cmd = build_batch_command("/imgs", "/ck.pth", "/out", batch=4,
                              prob_thresh=0.25, min_area=3,
                              px_per_micron=3.45, save_overlays=True,
                              background_radius=30, skip_excel=True,
                              python="python")
    assert cmd[:3] == ["python", "-m",
                       "unetdc_tpu.cli.quantify_droplets_batch"]
    s = " ".join(cmd)
    assert "--img_dir /imgs" in s
    assert "--prob_thresh 0.25" in s
    assert "--px_per_micron 3.45" in s
    assert "--save_overlays" in s
    assert "--skip_excel" in s
    assert "--skip_histogram" not in s
    with pytest.raises(ValueError):
        build_batch_command("", "/ck.pth", "/out")


def test_stage_timer_report():
    from unetdc_tpu.utils.profiling import (reset_stages, stage_report,
                                            stage_timer)

    reset_stages()
    with stage_timer("decode"):
        pass
    with stage_timer("decode"):
        pass
    rep = stage_report()
    assert "decode" in rep and "x2" in rep


@pytest.mark.slow
def test_train_dc_focal_cli_e2e_with_extra_viz(tmp_path, monkeypatch):
    """End-to-end focal-trainer CLI run incl. the reference's extra test-set
    visualization passes (train_DC_focal.py:506-611): the
    predicted_masks_test/ dump and the two triptych figure families must
    appear (VERDICT r1 item 6)."""
    import glob
    import os

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(11)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(6):
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            img_dir / f"t{i}.png")
        Image.fromarray(((rng.rand(40, 40) > 0.6) * 255).astype(
            np.uint8)).save(mask_dir / f"t{i}.png")

    from unetdc_tpu.cli.train_dc_focal import main

    monkeypatch.chdir(tmp_path)
    main(["--image_dir", str(img_dir), "--mask_dir", str(mask_dir),
          "--epochs", "1", "--batch", "2", "--img_size", "32",
          "--precision", "f32", "--no_augment", "--seed", "0",
          "--ckpt_path", str(tmp_path / "best.msgpack"),
          "--extra_test_viz", "--extra_viz_dir", str(tmp_path / "viz")])

    viz = tmp_path / "viz"
    preds = glob.glob(str(viz / "predicted_masks_test" / "*_pred.png"))
    assert preds, "predicted_masks_test dump missing"
    trip = glob.glob(str(viz / "prediction_visualization_test_batch*_img*.png"))
    assert trip, "prediction visualization triptychs missing"
    diffs = glob.glob(str(viz / "differences_overlay_batch*_img*.png"))
    assert diffs, "differences overlay triptychs missing"
    # mask dump resized to the original 40x40
    m = np.array(Image.open(preds[0]))
    assert m.shape == (40, 40) and set(np.unique(m)) <= {0, 255}


def test_frozen_gui_entry_dispatch(capsys, monkeypatch):
    """packaging/gui_entry.py doubles the frozen GUI exe as the CLI:
    `--cli quantify_droplets_batch --help` must reach the real parser, and
    the command builder must emit the self-invoking form when frozen."""
    import sys
    import runpy

    import pytest as _pytest

    sys.path.insert(0, "packaging")
    try:
        import gui_entry
    finally:
        sys.path.pop(0)

    monkeypatch.setattr(sys, "argv",
                        ["unetdc-gui", "--cli", "quantify_droplets_batch",
                         "--help"])
    with _pytest.raises(SystemExit) as e:
        gui_entry.main()
    assert e.value.code == 0
    assert "--img_dir" in capsys.readouterr().out

    monkeypatch.setattr(sys, "argv", ["unetdc-gui", "--cli", "nonsense"])
    with _pytest.raises(SystemExit) as e:
        gui_entry.main()
    assert e.value.code == 2

    # frozen command builder self-invokes the exe
    from unetdc_tpu.gui.command import build_batch_command

    monkeypatch.setattr(sys, "frozen", True, raising=False)
    cmd = build_batch_command("/imgs", "/ck.pth", "/out")
    assert cmd[:3] == [sys.executable, "--cli", "quantify_droplets_batch"]
