"""Pre-warm the persistent XLA compilation cache for a training config.

Wall-clock for the canonical anchors is dominated by compile time when
the cache is cold, and the shared compile service's latency varies
wildly run to run (BASELINE.md: identical runs at 8.1 vs 32.7 min).
This tool compiles the exact programs a subsequent
``primia_tpu.cli.train`` run will execute — train step, eval step —
into the persistent cache (``$PRIMIA_JAX_CACHE``), so the real run
starts hot.

Cache keys include constants baked into the jitted programs (the
dataset normalization stats closed over by ``build_*_step``), so the
tool computes the REAL per-dataset mean/std from ``--data_dir`` —
exact integer moments, bit-stable across runs — exactly as the
training CLI does.

Usage::

    python -m primia_tpu.cli.warm --config <ini> --data_dir <dir>

No reference counterpart (torch eager has no compile step); this is
TPU-build operational tooling.
"""

from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="INI config path")
    p.add_argument("--data_dir", required=True,
                   help="training data folder (or 'mnist')")
    return p


def main(argv=None) -> int:
    cmd = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from primia_tpu.config import Arguments
    from primia_tpu.nn import create_model
    from primia_tpu.train.loop import load_train_val
    from primia_tpu.train.losses import calc_class_weights
    from primia_tpu.train.optim import make_optimizer
    from primia_tpu.train.steps import TrainState, build_eval_step, build_train_step

    args = Arguments.from_ini(cmd.config, mode="train")
    args.data_dir = cmd.data_dir

    (train_imgs, train_labels, _val_imgs, _val_labels, mean, std,
     class_names) = load_train_val(args, verbose=False)
    nc = len(class_names)

    md = create_model(args, num_classes=nc)
    params, state = md.init(jax.random.PRNGKey(args.seed))
    opt = make_optimizer(args)
    ts = TrainState(params, state, opt.init(params))
    cw = calc_class_weights(train_labels, nc) if args.weight_classes else None

    if args.differentially_private:
        from primia_tpu.train.dp import build_dp_train_step

        train_step = build_dp_train_step(md, opt, args, mean, std, cw)
    else:
        train_step = build_train_step(md, opt, args, mean, std, cw)
    eval_step = build_eval_step(md, args, mean, std, cw)

    res = args.inference_resolution
    C = md.in_channels
    B = args.batch_size
    sds = jax.ShapeDtypeStruct
    import jax.numpy as jnp

    img = sds((B, res, res, C), jnp.uint8)
    lab = sds((B,), jnp.int32)
    msk = sds((B,), jnp.float32)
    key = sds((2,), jnp.uint32)

    n = 0
    t0 = time.perf_counter()
    train_step.lower(ts, key, img, lab, msk, 1e-4).compile()
    n += 1
    print(f"train step compiled ({time.perf_counter() - t0:.1f}s)", flush=True)

    vb = max(args.test_batch_size, 64)
    t0 = time.perf_counter()
    eval_step.lower(params, state, sds((vb, res, res, C), jnp.uint8),
                    sds((vb,), jnp.int32), sds((vb,), jnp.float32)).compile()
    n += 1
    print(f"eval step compiled ({time.perf_counter() - t0:.1f}s)", flush=True)
    print(f"warm: {n} programs in the persistent cache")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
