"""Hyperparameter search CLI — the reference's ``torchlib/find_config.py``.

Same search space (lr, end_lr, restarts, Adam betas, weight decay,
class weighting, the full augmentation block behind an ``apply albu``
gate, mixup, and — federated — repetitions/sync/weighted-averaging),
same pruning hooks (per-epoch Matthews reported to the study,
``train/loop.py`` raises ``TrialPruned``), driven by the self-contained
TPE-lite study in ``primia_tpu.train.hpo`` instead of Optuna+SQLite.

    python -m primia_tpu.cli.find_config --n_trials 50 [--federated]
        [--data_dir DIR] [--epochs 25] [--storage PATH]
"""

from __future__ import annotations

import argparse
import sys

from primia_tpu.config import Arguments
from primia_tpu.train.hpo import Study, TrialPruned


def build_args(trial, cmdln) -> Arguments:
    lr = trial.suggest_loguniform("lr", 1e-5, 1e-3)
    repetitions_dataset = (
        trial.suggest_int("repetitions_dataset", 1, 3) if cmdln.federated else 1
    )
    epochs = cmdln.epochs
    if cmdln.federated:
        epochs = int(epochs // repetitions_dataset)

    a = Arguments(
        name="hpo",
        train_federated=cmdln.federated,
        data_dir=cmdln.data_dir,
        batch_size=cmdln.batch_size,
        train_resolution=cmdln.resolution,
        inference_resolution=cmdln.resolution,
        test_batch_size=10,
        test_interval=1,
        validation_split=5,
        epochs=epochs,
        lr=lr,
        end_lr=trial.suggest_loguniform("end_lr", 1e-6, lr),
        restarts=trial.suggest_int("restarts", 0, 1),
        beta1=trial.suggest_float("beta1", 0.25, 0.95),
        beta2=trial.suggest_float("beta2", 0.9, 1.0),
        weight_decay=trial.suggest_loguniform("weight_decay", 1e-12, 1e-3),
        seed=1,
        deterministic=False,
        optimizer="Adam",
        model=cmdln.model,
        pretrained=cmdln.pretrained,
        weight_classes=trial.suggest_categorical("weight_classes", [True, False]),
        pooling_type="max",
        rotation=trial.suggest_int("rotation", 0, 90),
        translate=0.0,
        scale=trial.suggest_float("scale", 0.0, 0.5),
        shear=trial.suggest_int("shear", 0, 10),
        noise_std=trial.suggest_float("noise_std", 0.0, 0.1),
        noise_prob=trial.suggest_float("noise_prob", 0.0, 1.0),
        mixup=trial.suggest_categorical("mixup", [True, False]),
        repetitions_dataset=repetitions_dataset,
        save_file="model_weights/completed_trainings.csv",
    )

    apply_albu = trial.suggest_categorical("apply albu transforms", [True, False])
    a.albu_prob = trial.suggest_float("albu_prob", 0.0, 1.0) if apply_albu else 0.0
    a.individual_albu_probs = (
        trial.suggest_float("individual_albu_probs", 0.0, 1.0) if apply_albu else 0.0
    )
    for flag in ("clahe", "randomgamma", "randombrightness", "blur", "elastic",
                 "optical_distortion", "grid_distortion", "grid_shuffle", "hsv",
                 "invert", "cutout", "shadow", "fog", "sun_flare", "solarize",
                 "equalize", "grid_dropout"):
        setattr(a, flag,
                trial.suggest_categorical(flag, [True, False]) if apply_albu else False)

    if a.mixup:
        a.mixup_prob = trial.suggest_float("mixup_prob", 0.0, 1.0)
        a.mixup_lambda = None  # random lambda per batch (reference default)
    if cmdln.federated:
        a.sync_every_n_batch = trial.suggest_int("sync_every_n_batch", 1, 10)
        a.weighted_averaging = trial.suggest_categorical(
            "weighted_averaging", [True, False]
        )
        a.unencrypted_aggregation = cmdln.unencrypted_aggregation
    a.validate()
    return a


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_trials", type=int, default=50)
    p.add_argument("--federated", action="store_true")
    p.add_argument("--unencrypted_aggregation", action="store_true")
    p.add_argument("--websockets", action="store_true")
    p.add_argument("--data_dir", default="data/train")
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=200)
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--model", default="resnet-18")
    p.add_argument("--pretrained", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--storage", default="model_weights/hpo_study.json")
    cmdln = p.parse_args(argv)

    from primia_tpu.train.loop import main as train_main

    study = Study(cmdln.storage)

    def objective(trial):
        args = build_args(trial, cmdln)
        args.websockets = cmdln.websockets
        return train_main(args, verbose=False, optuna_trial=trial)

    best = study.optimize(objective, cmdln.n_trials, catch=(RuntimeError,))
    if best is not None:
        print(f"best trial #{best.number}: value={best.value}")
        print(best.params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
