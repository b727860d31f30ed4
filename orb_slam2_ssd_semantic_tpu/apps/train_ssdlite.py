"""Train MobileNetV2-SSDLite on the synthetic box world.

The reference's detector weights are a pretrained ncnn binary that is
absent from its snapshot (.MISSING_LARGE_BLOBS), so this framework
ships the full training path instead (semantic/train.py): synthetic
detection data by default, or any directory of images + YOLO-style
box/class labels via --data.

Usage:
  python -m orb_slam2_ssd_semantic_tpu.apps.train_ssdlite \
      --steps 2000 --batch 16 --out ssdlite_params.npz
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--classes", type=int, default=21, help="incl. background")
    p.add_argument("--out", default="ssdlite_params.npz")
    p.add_argument("--platform", default="default", choices=["default", "cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from orb_slam2_ssd_semantic_tpu.semantic.ssdlite import init_ssdlite, save_params
    from orb_slam2_ssd_semantic_tpu.semantic.train import (
        make_train_step,
        synthetic_detection_batch_device,
    )

    model, params = init_ssdlite(jax.random.PRNGKey(args.seed), args.classes)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    n_cls = min(3, args.classes - 1)

    # Data generated ON DEVICE (only a PRNG key crosses the host link per
    # step — essential through the remote-TPU relay) and the whole
    # generate+step pair runs as one jitted chunk of `inner` steps.
    INNER = 10

    @jax.jit
    def train_chunk(params, opt_state, key):
        def body(carry, k):
            params, opt_state = carry
            imgs, boxes, cls, valid = synthetic_detection_batch_device(
                k, args.batch, n_classes=n_cls
            )
            params, opt_state, loss = step(params, opt_state, imgs,
                                           boxes, cls, valid)
            return (params, opt_state), loss

        keys = jax.random.split(key, INNER)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(args.seed + 1)
    i = 0
    while i < args.steps:
        key, sub = jax.random.split(key)
        params, opt_state, losses = train_chunk(params, opt_state, sub)
        i += 10
        if (i // 10) % 5 == 0 or i >= args.steps:
            print(f"step {i:5d} loss {float(jnp.mean(losses)):8.4f} "
                  f"({(time.perf_counter() - t0):6.1f}s)")
    save_params(args.out, params)
    print(f"saved weights to {args.out}")
    return params


if __name__ == "__main__":
    main()
