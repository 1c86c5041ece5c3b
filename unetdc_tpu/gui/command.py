"""CLI command construction shared by both GUIs — mirrors the argument
assembly of the reference GUIs (gui.py:26-41, gui_qt.py:343-402) but targets
the TPU CLI module instead of a script path."""

from __future__ import annotations

import sys
from typing import List, Optional


def build_batch_command(
    img_dir: str,
    ckpt_path: str,
    out_dir: str,
    batch: int = 8,
    prob_thresh: float = 0.3,
    min_area: int = 1,
    px_per_micron: Optional[float] = None,
    save_overlays: bool = False,
    background_radius: int = 50,
    skip_excel: bool = False,
    skip_histogram: bool = False,
    python: Optional[str] = None,
) -> List[str]:
    """Validated argv for the batch quantification CLI.

    In a PyInstaller one-file build there is no `python -m` to spawn — the
    frozen executable re-invokes ITSELF with a `--cli <name>` prefix that
    `packaging/gui_entry.py` dispatches in-process (the TPU-native
    equivalent of the reference GUI's _MEIPASS script resolution,
    gui_qt.py:45-84)."""
    if not img_dir:
        raise ValueError("Images folder is required")
    if not ckpt_path:
        raise ValueError("Checkpoint path is required")
    if python is None and getattr(sys, "frozen", False):
        head = [sys.executable, "--cli", "quantify_droplets_batch"]
    else:
        head = [python or sys.executable, "-m",
                "unetdc_tpu.cli.quantify_droplets_batch"]
    cmd = head + [
        "--img_dir", str(img_dir),
        "--ckpt_path", str(ckpt_path),
        "--out_dir", str(out_dir),
        "--batch", str(int(batch)),
        "--prob_thresh", str(prob_thresh),
        "--min_area", str(int(min_area)),
        "--background_radius", str(int(background_radius)),
    ]
    if px_per_micron is not None:
        cmd += ["--px_per_micron", str(px_per_micron)]
    if save_overlays:
        cmd.append("--save_overlays")
    if skip_excel:
        cmd.append("--skip_excel")
    if skip_histogram:
        cmd.append("--skip_histogram")
    return cmd
