"""Every CLI's --help must format cleanly.

Regression for an unescaped ``%`` in an argparse help string (argparse
interpolates help text with %-formatting, so a literal ``%`` must be
written ``%%``): ``s1s2 train --help`` crashed with
``ValueError: unsupported format character`` instead of printing usage.
"""

import importlib

import pytest

CLI_MODULES = [
    "convert_ckpt",
    "distill",
    "evaluate",
    "infer_scene",
    "make_synthetic",
    "patchify",
    "quantize",
    "train",
    "validate_parity",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help_formats(name, capsys):
    mod = importlib.import_module(f"s1s2.cli.{name}")
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "usage:" in out
