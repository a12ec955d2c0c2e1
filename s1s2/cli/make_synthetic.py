"""Generate synthetic patch npz fixtures (testing/demo without rasters)."""

import argparse

from s1s2.data.synthetic import make_synthetic_patches


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("s1s2 make_synthetic")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--c_cond", type=int, default=4,
                    help="number of conditioning (S1-like) bands")
    ap.add_argument("--rich", action="store_true",
                    help="dataset-level learnable cond→target map "
                         "(one mixing matrix + nonlinear features) instead "
                         "of per-patch random mixing; see "
                         "s1s2.data.synthetic")
    args = ap.parse_args(argv)
    files = make_synthetic_patches(args.out, n=args.n, size=args.size,
                                   seed=args.seed, rich=args.rich,
                                   c_cond=args.c_cond)
    print(f"wrote {len(files)} patches to {args.out}")


if __name__ == "__main__":
    main()
