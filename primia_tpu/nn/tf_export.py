"""TensorFlow serving bridge: export trained models as TF SavedModels.

The reference ships framework bridges in ``syft/frameworks/keras/`` and
``syft/frameworks/crypten/`` (SURVEY §2.2): a hooked Keras model can be
served to TFE workers (``syft/frameworks/keras/model.py``), gated by
``syft/dependency_check.py`` when the peer framework is absent. The role
those bridges play — *hand a trained model to another framework's
serving stack* — maps here to ``jax2tf``: the jitted inference function
(center-crop + normalize + forward, exactly ``build_eval_step``'s
semantics) is staged out as StableHLO inside a ``tf.function`` and
written as a TF SavedModel, which TF-Serving / TFLite tooling can host
without any JAX on the serving side.

Like the reference, the bridge degrades gracefully: TensorFlow is an
optional dependency, imported lazily, and :func:`tf_available` mirrors
``dependency_check``'s gating so callers can probe before committing.

Checkpoint interop in the other direction (torch -> here) lives in
``nn/torch_import.py``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import numpy as np


def tf_available() -> bool:
    """Reference-style dependency gate (``syft/dependency_check.py``)."""
    try:
        import tensorflow  # noqa: F401

        return True
    except Exception:
        return False


def make_serving_fn(model_def, params, model_state, mean, std,
                    train_resolution: Optional[int] = None) -> Callable:
    """Pure-JAX inference closure over frozen weights.

    ``images_u8 (B, inference_res, inference_res, C) uint8 -> logits
    (B, num_classes) f32`` — identical preprocessing to
    ``train.steps.build_eval_step`` (center crop to the train
    resolution, per-channel normalize), inference-mode BN.
    """
    import jax.numpy as jnp

    from primia_tpu.ops.augment import normalize_only
    from primia_tpu.train.steps import _center_crop

    size = int(train_resolution or model_def.input_size)
    mean = np.asarray(mean)
    std = np.asarray(std)

    def serve(images_u8):
        x = _center_crop(images_u8, size)
        x = normalize_only(x, mean, std, model_def.in_channels)
        logits, _ = model_def.forward(params, model_state, x, train=False)
        return logits.astype(jnp.float32)

    return serve


def to_tf_function(model_def, params, model_state, mean, std, *,
                   batch_size: Optional[int] = None,
                   train_resolution: Optional[int] = None):
    """``tf.function`` computing logits from a uint8 NHWC image batch.

    ``batch_size=None`` exports with a dynamic leading dimension.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    serve = make_serving_fn(model_def, params, model_state, mean, std,
                            train_resolution)
    res = int(model_def.input_size)
    spec = tf.TensorSpec(
        [batch_size, res, res, model_def.in_channels], tf.uint8, name="images"
    )
    # with_gradient=False: serving artifact only — keeps the SavedModel
    # free of custom-gradient stubs that cannot round-trip anyway
    converted = jax2tf.convert(
        serve, polymorphic_shapes=[f"{'b' if batch_size is None else batch_size}, _, _, _"],
        with_gradient=False,
    )
    return tf.function(converted, input_signature=[spec], autograph=False)


def export_saved_model(model_def, params, model_state, mean, std, path: str,
                       *, batch_size: Optional[int] = None,
                       train_resolution: Optional[int] = None) -> str:
    """Write a TF SavedModel whose ``serve`` signature maps uint8 images
    to logits. Returns ``path``."""
    import tensorflow as tf

    fn = to_tf_function(model_def, params, model_state, mean, std,
                        batch_size=batch_size, train_resolution=train_resolution)
    module = tf.Module()
    module.serve = fn
    tf.saved_model.save(
        module, path, signatures={"serving_default": fn}
    )
    return path


def export_checkpoint(ckpt_path: str, out_dir: str,
                      batch_size: Optional[int] = None) -> str:
    """Convenience: load a training checkpoint (``train/checkpoint.py``
    format, which embeds ``args`` and ``val_mean_std`` — the same
    contract inference.py relies on, reference ``inference.py:82-93``)
    and export it as a SavedModel."""
    from primia_tpu.nn import create_model
    from primia_tpu.train import checkpoint as ckpt

    state = ckpt.load_model(ckpt_path)
    args = state["args"]
    mean, std = state["val_mean_std"]
    md = create_model(args)
    msd = state["model_state_dict"]
    return export_saved_model(
        md, msd["params"], msd["state"], mean, std, out_dir,
        batch_size=batch_size, train_resolution=args.train_resolution,
    )


def load_saved_model(path: str) -> Callable:
    """Reload an exported SavedModel as ``images_u8 -> logits (np)``."""
    import tensorflow as tf

    mod = tf.saved_model.load(path)

    def run(images_u8) -> np.ndarray:
        out = mod.serve(tf.constant(np.asarray(images_u8)))
        return np.asarray(out)

    return run
