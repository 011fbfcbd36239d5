"""Training CLI — flag-compatible with the reference ``train.py:555-631``.

Usage::

    python -m primia_tpu.cli.train --config configs/pneumonia-resnet.ini \
        --data_dir data/train [--train_federated] [--unencrypted_aggregation]
"""

from __future__ import annotations

import argparse
import configparser
import sys
from os import path
from warnings import warn

from primia_tpu.config import Arguments


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", type=str, required=True,
        help="Path to the configuration file (.ini).",
    )
    parser.add_argument(
        "--train_federated", action="store_true",
        help="Train with federated learning.",
    )
    parser.add_argument(
        "--unencrypted_aggregation", action="store_true",
        help="Turns off secure aggregation. Slight advantages in terms of "
        "model performance and training speed.",
    )
    parser.add_argument(
        "--data_dir", type=str, default="data/train",
        help="Select a data folder.",
    )
    parser.add_argument(
        "--visdom", action="store_true",
        help="Use live monitoring of training (CSV/console metrics stream).",
    )
    parser.add_argument(
        "--cuda", action="store_true",
        help="Accepted for reference CLI parity; this build targets TPU.",
    )
    parser.add_argument(
        "--resume_checkpoint", type=str, default=None,
        help="Start training from older model checkpoint",
    )
    parser.add_argument(
        "--websockets", action="store_true",
        help="Train against remote grid nodes instead of the on-device "
        "simulated federation.",
    )
    parser.add_argument(
        "--verbose", action="store_true", help="Verbose worker/metric output"
    )
    parser.add_argument(
        "--save_file", type=str, default="model_weights/completed_trainings.csv",
        help="Store args and result in csv file.",
    )
    parser.add_argument(
        "--training_name", default=None, type=str,
        help="Optional name to be stored in csv file to later identify training.",
    )
    return parser


def main(argv=None) -> float:
    cmd_args = build_parser().parse_args(argv)
    assert path.isfile(cmd_args.config), "Configuration file not found"
    args = Arguments.from_ini(cmd_args.config, mode="train", cmd_args=cmd_args,
                              verbose=True)
    if args.websockets and not args.train_federated:
        raise RuntimeError("WebSockets can only be used when in federated mode.")
    if args.train_federated and args.mixup and args.mixup_lambda == 0.5:
        warn(
            "Class weighting and a lambda value of 0.5 are incompatible, "
            "setting lambda to 0.499",
            category=RuntimeWarning,
        )
        args.mixup_lambda = 0.499
    print(str(args))

    from primia_tpu.train.loop import main as train_main

    return train_main(args, cmd_args=cmd_args)


if __name__ == "__main__":
    main()
