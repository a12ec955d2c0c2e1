"""Unified CLI dispatcher: ``python -m s1s2 <command> [args]``.

Commands map to the s1s2.cli modules (each also runnable directly as
``python -m s1s2.cli.<command>``).
"""

import sys

COMMANDS = {
    "train": "s1s2.cli.train",
    "evaluate": "s1s2.cli.evaluate",
    "patchify": "s1s2.cli.patchify",
    "infer_scene": "s1s2.cli.infer_scene",
    "convert_ckpt": "s1s2.cli.convert_ckpt",
    "validate_parity": "s1s2.cli.validate_parity",
    "make_synthetic": "s1s2.cli.make_synthetic",
    "quantize": "s1s2.cli.quantize",
    "distill": "s1s2.cli.distill",
    "serve": "s1s2.cli.serve",
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m s1s2 <command> [args]\ncommands: "
              + " ".join(sorted(COMMANDS)))
        sys.exit(0 if len(sys.argv) >= 2 else 2)
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; expected one of: "
              + " ".join(sorted(COMMANDS)))
        sys.exit(2)
    import importlib

    mod = importlib.import_module(COMMANDS[cmd])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
