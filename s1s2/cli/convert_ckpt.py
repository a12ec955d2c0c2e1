"""Convert a reference PyTorch ``.pth`` checkpoint to a s1s2 ``.msgpack``
params file (and report the inferred architecture)."""

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("s1s2 convert_ckpt")
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args(argv)

    import torch

    from s1s2.models.convert import (
        infer_arch_from_state_dict,
        torch_state_dict_to_params,
        unwrap_state_dict,
    )
    from s1s2.train.checkpoint import save_model

    sd = unwrap_state_dict(torch.load(args.pth, map_location="cpu", weights_only=True))
    arch = infer_arch_from_state_dict(sd)
    variables = torch_state_dict_to_params(sd)
    save_model(variables["params"], args.out)
    print(json.dumps({"out": args.out, **arch}))


if __name__ == "__main__":
    main()
