"""The training driver: datasets -> steps -> epochs -> checkpoints.

Re-creates the control flow of the reference ``train.py:54-552`` (local
path; the federated path plugs in through ``primia_tpu.parallel``):

- deterministic seeding, experiment naming, dataset + stats,
- initial eval, epoch loop with LR schedule,
- eval every ``test_interval`` epochs -> checkpoint per eval,
- best model by Matthews coefficient (last occurrence of the max),
  copied to ``model_weights/final_<exp>.pt``, others deleted,
- run registry CSV append.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from primia_tpu.config import Arguments
from primia_tpu.data import BatchLoader, ImageFolderDataset, calc_mean_std, random_split
from primia_tpu.data.loader import device_prefetch, to_device_resident
from primia_tpu.nn import create_model
from primia_tpu.train import checkpoint as ckpt
from primia_tpu.train import metrics as M
from primia_tpu.train.losses import calc_class_weights
from primia_tpu.train.lr import make_scheduler
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState, build_eval_step, build_train_step


def load_train_val(args: Arguments, verbose: bool = True):
    """Datasets + normalization stats for the local path
    (reference ``train.py:130-193``): train = ImageFolder(data_dir),
    val = sibling ``test`` folder when present, else a
    ``validation_split`` percent holdout."""
    channels = 1 if (args.data_dir == "mnist" or not args.pretrained) else 3
    if args.data_dir == "mnist":
        # the reference's "weak machine" path (train.py:99-129): 10-class
        # MNIST at train_resolution with the canonical normalization
        from primia_tpu.data.mnist import CLASSES, load_mnist, resize_to

        tri, trl, tei, tel = load_mnist()
        res = args.inference_resolution
        return (resize_to(tri, res), trl, resize_to(tei, res), tel,
                np.array([0.1307]), np.array([0.3081]), CLASSES)
    train_ds = ImageFolderDataset(args.data_dir, channels=channels)
    assert len(train_ds.classes) == 3, (
        "Dataset must have exactly 3 classes: normal, bacterial and viral"
    )
    test_dir = Path(args.data_dir).parent / "test"
    if test_dir.is_dir():
        val_ds = ImageFolderDataset(test_dir, channels=channels)
    else:
        n = len(train_ds)
        n_val = max(int(n / args.validation_split), 1)
        train_ds, val_ds = random_split(train_ds, [n - n_val, n_val], seed=args.seed)

    train_imgs, train_labels = train_ds.materialize(args.inference_resolution)
    val_imgs, val_labels = val_ds.materialize(args.inference_resolution)
    mean, std = calc_mean_std(train_imgs)
    class_names = train_ds.classes
    return (train_imgs, train_labels, val_imgs, val_labels, mean, std, class_names)


def run_eval(eval_step, params, model_state, loader, epoch, class_names,
             verbose=True):
    """One full validation pass -> (loss, objective=100*MCC); prints the
    stats table (reference ``test``, ``utils.py:1354-1467``)."""
    losses, logits_d, targets, keeps = [], [], [], []
    for batch in device_prefetch(loader):
        loss, logits = eval_step(params, model_state, batch.images, batch.labels,
                                 batch.mask)
        losses.append(loss)
        logits_d.append(logits)
        keeps.append(batch.mask > 0)
        targets.append(batch.labels)
    # one batched device->host fetch for the whole pass (per-batch
    # float()/asarray() costs a blocking tunnel round-trip each)
    losses, logits_h = jax.device_get((losses, logits_d))
    scores = np.concatenate([lg[k] for lg, k in zip(logits_h, keeps)])
    targets = np.concatenate([t[k] for t, k in zip(targets, keeps)])
    preds = scores.argmax(1)
    test_loss = float(np.mean(losses))
    m = M.evaluate_predictions(targets, preds, scores,
                               num_classes=len(class_names))
    if verbose:
        print(
            M.stats_table(
                m["conf_matrix"], m["report"], roc_auc=m["roc_auc"],
                matthews_coeff=m["matthews_coeff"], class_names=class_names,
                epoch=epoch,
            )
        )
    return test_loss, m["objective"]


def main(args: Arguments, verbose: bool = True, optuna_trial=None,
         cmd_args=None, weights_dir: str = "model_weights") -> float:
    if args.train_federated:
        from primia_tpu.parallel.federated import main_federated

        return main_federated(args, verbose=verbose, optuna_trial=optuna_trial,
                              weights_dir=weights_dir)

    timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_name = "{:s}_{:s}_{:s}".format(
        "federated" if args.train_federated else "vanilla",
        args.data_dir.replace("/", ""),
        timestamp,
    )

    # live dashboard (the reference's visdom role; --visdom enables it)
    from primia_tpu.train.monitor import Monitor, NullMonitor

    mon = Monitor(exp_name) if args.visdom else NullMonitor()
    if args.visdom and verbose:
        print(f"Live dashboard: {mon.html}")

    (train_imgs, train_labels, val_imgs, val_labels, mean, std,
     class_names) = load_train_val(args, verbose)
    num_classes = len(class_names)

    model_def = create_model(args, num_classes=num_classes)
    key = jax.random.PRNGKey(args.seed if args.deterministic else int.from_bytes(os.urandom(4), "little"))
    key, init_key = jax.random.split(key)
    params, model_state = model_def.init(init_key)

    cw = calc_class_weights(train_labels, num_classes) if args.weight_classes else None
    optimizer = make_optimizer(args)
    opt_state = optimizer.init(params)
    ts = TrainState(params, model_state, opt_state)
    scheduler = make_scheduler(args)

    start_at_epoch = 1
    if args.resume_checkpoint:
        # reference handles all 4 (was-federated x is-federated) cases
        # (train.py:345-389); this is the (x -> local) half
        state = ckpt.load_model(args.resume_checkpoint)
        start_at_epoch = int(state["epoch"]) + 1
        msd = state["model_state_dict"]
        osd = state["optim_state_dict"]
        was_fed = bool(getattr(state["args"], "train_federated", False))
        if was_fed or isinstance(osd, dict):
            # federated checkpoints carry a per-worker optimizer dict;
            # a local continuation starts the optimizer fresh
            osd = optimizer.init(msd["params"])
            if verbose:
                print("Resuming a federated checkpoint locally: "
                      "optimizer state reset")
        ts = TrainState(msd["params"], msd["state"], osd)
        if verbose:
            print(f"Resuming from {args.resume_checkpoint} at epoch {start_at_epoch}")

    # plain step, or DP-SGD when the config asks (ghost-norm clipping
    # by default; PRIMIA_DP_GHOST=0 restores the microbatch path)
    from primia_tpu.train.dp import select_train_step

    train_step = select_train_step(model_def, optimizer, args, mean, std, cw)
    eval_step = build_eval_step(model_def, args, mean, std, cw)

    # DP parameter averaging (post-processing, no privacy cost): eval
    # and checkpoints use the EMA of the trajectory, cancelling the
    # zero-mean injected noise walk (De et al. 2022)
    ema_decay = float(getattr(args, "parameter_ema", 0.0) or 0.0)
    use_ema = args.differentially_private and 0.0 < ema_decay < 1.0
    ema_params = (jax.tree.map(jax.numpy.copy, ts.params)
                  if use_ema else None)
    ema_update = jax.jit(lambda e, p: jax.tree.map(
        lambda a, b: ema_decay * a + (1.0 - ema_decay) * b, e, p))

    def eval_params():
        return ema_params if use_ema else ts.params

    # datasets live in HBM when they fit: batches become on-device
    # gathers instead of per-step host transfers
    train_loader = BatchLoader(
        to_device_resident(train_imgs), train_labels, args.batch_size,
        shuffle=True, seed=args.seed, pad_final=False,
    )
    # eval results are batch-size invariant (inference-mode BN, masked
    # padding), so the loader floors tiny test_batch_size values: the
    # canonical INI says 1, which on an accelerator means one dispatch
    # per image
    val_loader = BatchLoader(
        to_device_resident(val_imgs), val_labels, max(args.test_batch_size, 64),
        shuffle=False, pad_final=True,
    )

    run_eval(eval_step, eval_params(), ts.model_state, val_loader,
             start_at_epoch - 1, class_names, verbose)

    matthews_scores, model_paths = [], []
    os.makedirs(weights_dir, exist_ok=True)
    # background checkpoint writer (one worker: writes stay ordered);
    # futures are collected so save errors surface, and at most one save
    # is in flight so queued device snapshots can't pile up in HBM
    from concurrent.futures import ThreadPoolExecutor

    ckpt_writer = ThreadPoolExecutor(max_workers=1)
    ckpt_futures = []

    def submit_save(**kw):
        if ckpt_futures:
            ckpt_futures[-1].result()  # bound in-flight saves to 1
        ckpt_futures.append(ckpt.save_model(**kw, executor=ckpt_writer))

    try:
        for epoch in range(start_at_epoch, args.epochs + 1):
            lr = scheduler.get_lr(epoch - 1)
            avg_loss = []
            for batch in device_prefetch(train_loader):
                key, sk = jax.random.split(key)
                ts, loss = train_step(ts, sk, batch.images, batch.labels, batch.mask, lr)
                if use_ema:
                    ema_params = ema_update(ema_params, ts.params)
                avg_loss.append(loss)
            epoch_loss = float(np.mean(jax.device_get(avg_loss)))
            mon.add_scalar("train_loss", epoch, epoch_loss)
            mon.add_scalar("lr", epoch, float(lr))
            if verbose:
                print("Train Epoch: {} \tLoss: {:.6f}".format(epoch, epoch_loss))
            if args.differentially_private and verbose:
                from primia_tpu.train.dp import rdp_epsilon

                eps, alpha = rdp_epsilon(
                    noise_multiplier=args.noise_multiplier,
                    sample_rate=min(args.batch_size / max(len(train_imgs), 1), 1.0),
                    steps=epoch * len(train_loader),
                    delta=args.target_delta,
                )
                print(f"(eps = {eps:.2f}, delta = {args.target_delta}) at alpha = {alpha}")

            if (epoch % args.test_interval) == 0:
                val_loss, matthews = run_eval(
                    eval_step, eval_params(), ts.model_state, val_loader,
                    epoch, class_names, verbose,
                )
                mon.add_scalar("val_loss", epoch, float(val_loss))
                mon.add_scalar("val_mcc", epoch, float(matthews))
                model_path = os.path.join(
                    weights_dir, "{:s}_epoch_{:03d}.pt".format(
                        exp_name, epoch * (args.repetitions_dataset or 1)
                    )
                )
                if optuna_trial is not None:
                    optuna_trial.report(matthews, epoch * (args.repetitions_dataset or 1))
                    if optuna_trial.should_prune():
                        from primia_tpu.train.hpo import TrialPruned

                        raise TrialPruned()
                submit_save(
                    path=model_path, epoch=epoch, params=eval_params(),
                    model_state=ts.model_state, opt_state=ts.opt_state,
                    args=args, val_mean_std=(mean, std),
                )
                matthews_scores.append(matthews)
                model_paths.append(model_path)
    finally:
        # all checkpoint writes must hit disk before best-model
        # selection copies/deletes them (and even when the loop exits
        # via TrialPruned or any error, the writer must not leak)
        ckpt_writer.shutdown(wait=True)
    for f in ckpt_futures:
        f.result()  # surface background fetch/write errors

    if not matthews_scores:
        # resumed at/after the final epoch: nothing to train or select
        if verbose:
            print(f"Nothing to do: resume epoch {start_at_epoch} is past "
                  f"epochs={args.epochs}")
        return 0.0

    # last occurrence of the highest score wins (reference train.py:519-533)
    rev = np.array(matthews_scores)[::-1]
    best_score_idx = int(np.argmax(rev))
    highest_score = len(rev) - best_score_idx - 1
    best_epoch = (highest_score + 1) * args.test_interval
    best_model_file = model_paths[highest_score]
    if verbose:
        print(
            "Highest matthews coefficient was {:.1f}% in epoch {:d}".format(
                rev[best_score_idx],
                best_epoch * (args.repetitions_dataset if args.train_federated else 1),
            )
        )
    shutil.copyfile(
        best_model_file, os.path.join(weights_dir, f"final_{exp_name}.pt")
    )
    if args.save_file:
        ckpt.save_config_results(args, float(rev[best_score_idx]), timestamp)
    for p in model_paths:
        os.remove(p)
    return float(rev[best_score_idx])
