"""Inference CLI (reference ``inference.py:44-343``).

Loads a checkpoint (restores its ``args`` + ``val_mean_std``), classifies
every image in ``--data_dir``, and writes ``{"Inference Results":
{index: prediction}}`` as JSON to stdout, followed by a class count and
the wall-clock time — byte-for-byte the reference's output contract.

``--encrypted_inference`` routes the forward pass through the MPC engine
(2 compute parties + crypto provider simulated as a party axis on the
device mesh, FSS comparisons, fixed-point ring Z_{2^64});
``--websockets_config`` targets genuinely-remote workers via
``primia_tpu.serve``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import Counter


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default=None, help="data to classify")
    parser.add_argument(
        "--model_weights", type=str, required=True, help="model weights to use"
    )
    parser.add_argument(
        "--encrypted_inference", action="store_true",
        help="Perform encrypted inference",
    )
    parser.add_argument(
        "--protocol", type=str, default="fss", choices=("snn", "fss"),
        help="MPC comparison protocol for encrypted inference: fss "
             "(AriaNN DCF — the reference's default, and the fastest "
             "path at the canonical 224 px since the fused merged-eval "
             "kernel) or snn (SecureNN bit circuit — measured faster "
             "for the 512 px zoo model, BASELINE.md round 5)",
    )
    parser.add_argument(
        "--websockets_config", default=None,
        help="csv file with id/host/port rows for data_owner, model_owner "
        "and crypto_provider; if not passed, the simulated on-device "
        "parties are used",
    )
    parser.add_argument(
        "--cuda", action="store_true",
        help="Accepted for reference CLI parity; this build targets TPU.",
    )
    parser.add_argument(
        "--http_protocol", action="store_true",
        help="Use HTTP only instead of WS (remote mode).",
    )
    parser.add_argument(
        "--batch_size", type=int, default=1,
        help="Images per forward pass (the reference runs 1; larger batches "
        "amortize compile + MXU occupancy on TPU).",
    )
    parser.add_argument(
        "--mpc_batch_tile", type=int, default=None,
        help="Encrypted path: run the share-space forward this many "
        "images at a time under an on-device loop, bounding compile "
        "size and live dealer material — lets batch_size (and high "
        "resolutions) scale past the compiler. Default: whole batch "
        "in one graph (fastest while it fits; use 8 for batch >16 "
        "@224 px, 1 for 512 px).",
    )
    return parser


def run(cmd_args) -> dict:
    import numpy as np

    from primia_tpu.config import Arguments
    from primia_tpu.data import PathDataset
    from primia_tpu.nn import create_model
    from primia_tpu.train import checkpoint as ckpt
    from primia_tpu.train.steps import build_predict_step

    state = ckpt.load_model(cmd_args.model_weights)
    args: Arguments = state["args"]
    args.from_previous_checkpoint(cmd_args)
    sys.stderr.write(str(args))

    mean, std = state["val_mean_std"]
    channels = 1 if not args.pretrained else 3
    class_names = {0: "normal", 1: "bacterial pneumonia", 2: "viral pneumonia"}

    if cmd_args.websockets_config:
        from primia_tpu.serve.client import RemoteInferenceSession

        session = RemoteInferenceSession(cmd_args.websockets_config,
                                         http_only=cmd_args.http_protocol)
        imgs = session.fetch_inference_data()
    else:
        dataset = PathDataset(cmd_args.data_dir, channels=channels)
        imgs, _ = dataset.materialize(args.inference_resolution)

    model_def = create_model(args, num_classes=len(class_names))
    msd = state["model_state_dict"]

    if cmd_args.encrypted_inference:
        from primia_tpu.mpc.inference import build_encrypted_predict

        predict = build_encrypted_predict(
            model_def, args, mean, std,
            precision_fractional=args.precision_fractional or 16,
            protocol=cmd_args.protocol,
            batch_tile=cmd_args.mpc_batch_tile,
        )
    else:
        predict = build_predict_step(model_def, args, mean, std)

    B = max(int(cmd_args.batch_size), 1)
    total_pred = []
    for i in range(0, len(imgs), B):
        chunk = imgs[i : i + B]
        if len(chunk) < B:  # pad to the compiled shape
            pad = B - len(chunk)
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            logits = np.asarray(predict(msd["params"], msd["state"], chunk))[: B - pad]
        else:
            logits = np.asarray(predict(msd["params"], msd["state"], chunk))
        total_pred.extend(int(p) for p in logits.argmax(1))
    return {"Inference Results": dict(enumerate(total_pred))}


def main(argv=None):
    tick = time.time()
    cmd_args = build_parser().parse_args(argv)
    pred_dict = run(cmd_args)
    sys.stdout.write(json.dumps(pred_dict))
    print("\n{:s}".format(str(Counter(pred_dict["Inference Results"].values()))))
    tock = time.time()
    print()
    print(f"Took {tock-tick} seconds.")
    return pred_dict


if __name__ == "__main__":
    main()
