"""GUI front-ends (reference gui.py / gui_qt.py parity).

Both GUIs are thin shells over the batch CLI: they build an argument list
and run `python -m unetdc_tpu.cli.quantify_droplets_batch` in a subprocess,
streaming its stdout (the CLI's stdout format is a stable API,
gui_qt.py:113-116). Toolkits are imported lazily so headless installs never
pay for them.
"""

from unetdc_tpu.gui.command import build_batch_command  # noqa: F401
