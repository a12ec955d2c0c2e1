"""Cast a params msgpack to bf16 and save (halves size for archiving).

Used to commit distilled-student evidence checkpoints under
examples/checkpoints/ without doubling the repo: models cast params to the
compute dtype (bf16) inside the forward anyway, so a bf16-stored checkpoint
evaluates identically up to that cast (verify with score_distill_full).

Usage:
    JAX_PLATFORMS=cpu python tools/archive_ckpt.py in.msgpack out.msgpack
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src, dst = sys.argv[1], sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    with open(src, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    tree = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if np.issubdtype(
            np.asarray(x).dtype, np.floating) else x, tree)
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))
    print(f"{src} ({os.path.getsize(src)>>20} MiB) -> "
          f"{dst} ({os.path.getsize(dst)>>20} MiB)")


if __name__ == "__main__":
    main()
