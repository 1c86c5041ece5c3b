"""PyInstaller one-file entry point for the Qt GUI.

Parity target: the reference ships `pyinstaller --onefile gui_qt.py`
(README.md:87-131) and resolves its worker script through sys._MEIPASS
(gui_qt.py:45-84). A frozen one-file app has no `python -m` to spawn, so
this entry makes the executable double as the CLI: the GUI builds worker
commands as `<exe> --cli quantify_droplets_batch ...` (gui/command.py) and
this module dispatches them in-process before Qt ever loads.

Build (see packaging/README.md):
    pip install pyinstaller
    pyinstaller packaging/unetdc_gui.spec
"""

from __future__ import annotations

import os
import sys

if not getattr(sys, "frozen", False):
    # running as a plain script: `python packaging/gui_entry.py` puts
    # packaging/ (not the repo root) on sys.path — fix that up so the
    # documented smoke command works outside a frozen bundle
    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _root not in sys.path:
        sys.path.insert(0, _root)

_CLI_MODULES = {
    "quantify_droplets_batch": "unetdc_tpu.cli.quantify_droplets_batch",
    "quantify_pipline": "unetdc_tpu.cli.quantify_pipline",
    "quantify": "unetdc_tpu.cli.quantify",
    "train": "unetdc_tpu.cli.train",
    "train_dc_focal": "unetdc_tpu.cli.train_dc_focal",
}


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cli":
        name = sys.argv[2] if len(sys.argv) >= 3 else ""
        mod_name = _CLI_MODULES.get(name)
        if mod_name is None:
            sys.stderr.write(
                f"unknown --cli target {name!r}; valid: "
                f"{', '.join(sorted(_CLI_MODULES))}\n")
            raise SystemExit(2)
        import importlib

        mod = importlib.import_module(mod_name)
        mod.main(sys.argv[3:])
        return

    from unetdc_tpu.gui.qt_app import main as gui_main

    gui_main()


if __name__ == "__main__":
    main()
