"""Certify reference checkpoints against the converted JAX model.

Forward parity (per checkpoint):
    python -m s1s2.cli.validate_parity --pth ddpm_s1_to_s2_v3.pth

Table parity (every BASELINE.md row; needs the real patches + checkpoints):
    python -m s1s2.cli.validate_parity --full --patch_dir P --out_dir O \
        --eps_ckpt ddpm_s1_to_s2_v3.pth [--v_ckpt ...] [--rel_tol 0.02]

--full reruns the exact configs behind the reference's committed result
tables (`eval/parity.py`) and writes parity_report.{json,txt} with a
per-number pass/fail diff. Tables whose checkpoint family is not supplied
are reported as skipped.
"""

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("s1s2 validate_parity")
    ap.add_argument("--pth", help="forward-parity mode: one .pth to certify")
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    # --full table mode
    ap.add_argument("--full", action="store_true",
                    help="rerun every BASELINE.md table and diff")
    ap.add_argument("--patch_dir")
    ap.add_argument("--out_dir")
    ap.add_argument("--eps_ckpt", help="ddpm_s1_to_s2_v3 family (.pth/.msgpack)")
    ap.add_argument("--v_ckpt", help="ddpm_s1_to_s2_upgraded_v family")
    ap.add_argument("--cfg_ckpt", help="ddpm_s1_to_s2_cfg_v family")
    ap.add_argument("--rel_tol", type=float, default=0.02)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--base_ch", type=int, default=96)
    ap.add_argument("--expected", default=None,
                    help="JSON file overriding/extending the expected tables")
    args = ap.parse_args(argv)

    if args.full:
        assert args.patch_dir and args.out_dir, "--full needs --patch_dir/--out_dir"
        from s1s2.eval.parity import run_full_parity

        expected = None
        if args.expected:
            with open(args.expected) as f:
                expected = json.load(f)
        ckpts = {k: v for k, v in (("eps", args.eps_ckpt), ("v", args.v_ckpt),
                                   ("cfg_v", args.cfg_ckpt)) if v}
        report = run_full_parity(
            args.patch_dir, args.out_dir, ckpts, expected=expected,
            rel_tol=args.rel_tol, batch_size=args.batch_size, T=args.T,
            base_ch=args.base_ch,
        )
        print(json.dumps({k: report[k] for k in
                          ("tables_ran", "tables_skipped_no_ckpt",
                           "n_pass", "n_fail", "all_pass")}))
        return

    assert args.pth, "--pth required (or use --full)"
    from s1s2.models.torch_twin import validate_pth_parity

    report = validate_pth_parity(args.pth, args.image_size, args.batch, args.seed)
    report["pass"] = report["max_abs"] < 1e-3
    print(json.dumps(report))


if __name__ == "__main__":
    main()
