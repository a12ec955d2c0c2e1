"""Certify a reference .pth checkpoint against the converted JAX model.

    python -m s1s2.cli.validate_parity --pth ddpm_s1_to_s2_v3.pth

Runs the original torch forward and the converted NHWC forward on identical
inputs and reports the deviation (should be ≲1e-4 at f32 — the converter
contract). Use before trusting published-number reproduction runs.
"""

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("s1s2 validate_parity")
    ap.add_argument("--pth", required=True)
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from s1s2.models.torch_twin import validate_pth_parity

    report = validate_pth_parity(args.pth, args.image_size, args.batch, args.seed)
    report["pass"] = report["max_abs"] < 1e-3
    print(json.dumps(report))


if __name__ == "__main__":
    main()
