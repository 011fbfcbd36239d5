"""Eval CLI — plaintext test-set metrics (reference ``test.py:21-192``).

Loads a checkpoint (including its stored ``args`` and ``val_mean_std``),
runs the model over an image-folder test set, and prints the stats table
(confusion matrix, per-class recall/precision/F1, MCC, ROC-AUC).
"""

from __future__ import annotations

import argparse

import numpy as np

from primia_tpu.config import Arguments


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--data_dir", type=str, required=True,
        help="Select a data folder.",
    )
    parser.add_argument(
        "--model_weights", type=str, required=True, help="model weights to use"
    )
    parser.add_argument(
        "--cuda", action="store_true",
        help="Accepted for reference CLI parity; this build targets TPU.",
    )
    return parser


def main(argv=None):
    cmd_args = build_parser().parse_args(argv)

    from primia_tpu.data import BatchLoader, ImageFolderDataset
    from primia_tpu.nn import create_model
    from primia_tpu.train import checkpoint as ckpt
    from primia_tpu.train import metrics as M
    from primia_tpu.train.steps import build_predict_step

    state = ckpt.load_model(cmd_args.model_weights)
    args: Arguments = state["args"]
    args.from_previous_checkpoint(cmd_args)
    print(str(args))

    mean, std = state["val_mean_std"]
    channels = 1 if not args.pretrained else 3
    ds = ImageFolderDataset(cmd_args.data_dir, channels=channels)
    imgs, labels = ds.materialize(args.inference_resolution)

    model_def = create_model(args, num_classes=len(ds.classes))
    msd = state["model_state_dict"]
    predict = build_predict_step(model_def, args, mean, std)

    loader = BatchLoader(imgs, labels, max(args.test_batch_size, 64), shuffle=False,
                         pad_final=True)
    preds, targets, scores = [], [], []
    for batch in loader:
        logits = np.asarray(predict(msd["params"], msd["state"], batch.images))
        keep = batch.mask > 0
        preds.append(logits[keep].argmax(1))
        scores.append(logits[keep])
        targets.append(batch.labels[keep])
    preds = np.concatenate(preds)
    targets = np.concatenate(targets)
    scores = np.concatenate(scores)

    m = M.evaluate_predictions(targets, preds, scores)
    table = M.stats_table(
        m["conf_matrix"], m["report"], roc_auc=m["roc_auc"],
        matthews_coeff=m["matthews_coeff"], class_names=ds.classes,
        epoch=int(state["epoch"]),
    )
    print(table)
    return m


if __name__ == "__main__":
    main()
