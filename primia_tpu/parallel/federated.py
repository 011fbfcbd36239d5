"""Federated training as sharded on-device simulation — workload 3/6.

Reference (``torchlib/utils.py:936-1233``): per-worker model replicas
stepped round-robin over remote pointer batches; every
``sync_every_n_batch`` batches the models are securely aggregated and
re-broadcast, optimizers reset. Hospital nodes are processes; every
tensor op is a message.

TPU redesign: the node dimension is an *array axis*. Per-node replicas
are one stacked pytree (leaves ``(N_nodes, ...)``); one ``vmap``-ed (or
node-sharded ``shard_map``-ed) train step advances every node in
parallel — the reference's round-robin is just a sequentialized version
of the same independent updates. Nodes with exhausted shards are masked
(reference: ``batch_idx >= num_batches[worker] -> continue``,
``utils.py:1166-1167``). FedAvg is a share-space reduce over the node
axis (``primia_tpu.mpc.aggregation``).
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from primia_tpu.config import Arguments, read_worker_config
from primia_tpu.data.loader import to_device_resident
from primia_tpu.data import BatchLoader, ImageFolderDataset, calc_mean_std
from primia_tpu.mpc.aggregation import plain_fedavg, secure_average_stats, secure_fedavg
from primia_tpu.nn import create_model
from primia_tpu.train import checkpoint as ckpt
from primia_tpu.train.loop import run_eval
from primia_tpu.train.losses import calc_class_weights
from primia_tpu.train.lr import make_scheduler
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState, build_eval_step, build_train_step


def discover_workers(args: Arguments) -> List[str]:
    """Worker names: ``configs/websetting/config.csv`` when present
    (reference ``setup_pysyft``), else the ``worker*`` folders under
    ``data_dir``. The crypto provider row is split off as in the
    reference (``utils.py:525-541``)."""
    csv_path = Path("configs/websetting/config.csv")
    if csv_path.is_file():
        cfg = read_worker_config(csv_path)
        names = [w for w in cfg if w != "crypto_provider"]
        if not args.unencrypted_aggregation and "crypto_provider" not in cfg:
            raise AssertionError("No crypto provider in configuration")
        return names
    root = Path(args.data_dir)
    names = sorted(
        d.name for d in root.iterdir() if d.is_dir() and d.name.startswith("worker")
    )
    if not names:
        raise FileNotFoundError(
            f"no worker folders under {root} and no configs/websetting/config.csv"
        )
    return names


def setup_federated(args: Arguments, verbose: bool = True):
    """Load per-worker shards + validation set; securely average stats.

    Data layout mirrors the reference: ``{data_dir}/worker{i}`` per
    worker, ``{data_dir}/validation`` for the local val set
    (``utils.py:643-660,814-826``).
    """
    worker_names = discover_workers(args)
    channels = 1 if not args.pretrained else 3
    node_imgs, node_labels, means, stds = [], [], [], []
    class_names = None
    for i, _name in enumerate(worker_names):
        d = Path(args.data_dir) / f"worker{i + 1}"
        ds = ImageFolderDataset(d, channels=channels)
        assert len(ds.classes) == 3, (
            "We can only handle data that has 3 classes: normal, bacterial and viral"
        )
        class_names = ds.classes
        imgs, labels = ds.materialize(args.inference_resolution)
        m, s = calc_mean_std(imgs)
        node_imgs.append(imgs)
        node_labels.append(labels)
        means.append(m)
        stds.append(s)

    key = jax.random.PRNGKey(args.seed)
    mean = secure_average_stats(jax.random.fold_in(key, 1), means,
                                args.precision_fractional)
    std = secure_average_stats(jax.random.fold_in(key, 2), stds,
                               args.precision_fractional)

    val_ds = ImageFolderDataset(Path(args.data_dir) / "validation", channels=channels)
    val_imgs, val_labels = val_ds.materialize(args.inference_resolution)
    if verbose:
        total = sum(len(x) for x in node_imgs)
        print(f"Found a total dataset with {total:d} samples on remote workers")
        print(f"Found a total validation set with {len(val_imgs):d} samples (locally)")
    return worker_names, node_imgs, node_labels, val_imgs, val_labels, mean, std, class_names


def _stack_tree(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _index_tree(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def main_federated_ws(args: Arguments, verbose: bool = True,
                      weights_dir: str = "model_weights",
                      config_csv: str = "configs/websetting/config.csv") -> float:
    """Federated training against live grid nodes (``--websockets``).

    Unlike the reference — which hooks every tensor op into a websocket
    message (``torchlib/utils.py:1159-1174``) — each round is ONE RPC
    per node: the node runs ``sync_every_n_batch`` local steps on its
    own shard (raw data never leaves it) and returns parameters, which
    are aggregated here and re-broadcast.
    """
    import jax

    from primia_tpu.serve.client import clients_from_csv
    from primia_tpu.serve.node import _flatten, _unflatten

    timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_name = "federated_{:s}_{:s}".format(args.data_dir.replace("/", ""), timestamp)

    from primia_tpu.train.monitor import Monitor, NullMonitor

    mon = Monitor(exp_name) if args.visdom else NullMonitor()
    if args.visdom and verbose:
        print(f"Live dashboard: {mon.html}")
    clients = {
        w: c for w, c in clients_from_csv(config_csv).items()
        if w != "crypto_provider"
    }
    worker_names = list(clients)
    n_nodes = len(worker_names)

    key = jax.random.PRNGKey(args.seed)
    means = [c.get_obj("#datamean") for c in clients.values()]
    stds = [c.get_obj("#datastd") for c in clients.values()]
    mean = secure_average_stats(jax.random.fold_in(key, 1), means,
                                args.precision_fractional)
    std = secure_average_stats(jax.random.fold_in(key, 2), stds,
                               args.precision_fractional)

    channels = 1 if not args.pretrained else 3
    val_ds = ImageFolderDataset(Path(args.data_dir) / "validation", channels=channels)
    val_imgs, val_labels = val_ds.materialize(args.inference_resolution)
    class_names = val_ds.classes
    num_classes = len(class_names)

    model_def = create_model(args, num_classes=num_classes)
    params, state = model_def.init(jax.random.fold_in(key, 0))
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)
    eval_step = build_eval_step(model_def, args, mean, std)
    val_loader = BatchLoader(val_imgs, val_labels, max(args.test_batch_size, 64),
                             shuffle=False, pad_final=True)
    scheduler = make_scheduler(args)

    matthews_scores, model_paths = [], []
    os.makedirs(weights_dir, exist_ok=True)
    steps_round = max(args.sync_every_n_batch, 1)
    for epoch in range(1, args.epochs + 1):
        lr = scheduler.get_lr(epoch - 1)
        # node batch counts drive rounds/epoch + weights
        counts = {}
        rounds = 1
        losses = []
        for r in range(1000):  # bounded by the largest shard
            # fan the round out to every node concurrently (the
            # reference's async_dispatch, base.py:483-491 — one thread
            # per node instead of asyncio since each RPC is one blocking
            # request/response)
            from concurrent.futures import ThreadPoolExecutor

            def one_round(item):
                w, c = item
                return w, c.send({
                    "type": "train_round", "args": args.to_json(),
                    "params": _flatten(params), "model_state": _flatten(state),
                    "n_steps": steps_round, "lr": lr,
                    "seed": args.seed + epoch * 1000 + r,
                    "num_classes": num_classes,
                })

            results = {}
            with ThreadPoolExecutor(max_workers=n_nodes) as ex:
                for w, out in ex.map(one_round, clients.items()):
                    if "error" in out:
                        raise RuntimeError(f"{w}: {out['error']}")
                    results[w] = out
                    counts[w] = out["n_batches"] * max(args.repetitions_dataset, 1)
                    losses.append(out["loss"])
            total = sum(counts.values())
            agg_w = (np.array([counts[w] / total for w in worker_names])
                     if args.weighted_averaging
                     else np.full(n_nodes, 1.0 / n_nodes))
            stacked = {
                "p": _stack_tree([_unflatten(results[w]["params"])
                                  for w in worker_names]),
                "s": _stack_tree([_unflatten(results[w]["model_state"])
                                  for w in worker_names]),
            }
            if args.unencrypted_aggregation:
                agg = plain_fedavg(stacked, agg_w)
            else:
                agg = secure_fedavg(jax.random.fold_in(key, 700 + r), stacked,
                                    agg_w, args.precision_fractional)
            params = jax.tree.map(np.asarray, agg["p"])
            state = jax.tree.map(np.asarray, agg["s"])
            rounds = max(
                1, int(np.ceil(max(counts.values()) / steps_round))
            )
            if r + 1 >= rounds:
                break
        if verbose:
            print("Train Epoch: {} \tLoss: {:.6f}".format(epoch, float(np.mean(losses))))
        if args.differentially_private and verbose:
            # nodes clip+noise locally (serve/node.py:_train_round);
            # account per node from what crossed the wire: sampling
            # rate 1/n_batches (batch of N/n_batches from N examples)
            # and rounds*steps_round steps per epoch
            from primia_tpu.train.dp import rdp_epsilon

            per_node = []
            for w in worker_names:
                nb = max(int(results[w]["n_batches"]), 1)
                eps, alpha = rdp_epsilon(
                    noise_multiplier=args.noise_multiplier,
                    sample_rate=min(1.0 / nb, 1.0),
                    steps=epoch * rounds * steps_round,
                    delta=args.target_delta,
                )
                per_node.append((w, eps, alpha))
            worst = max(per_node, key=lambda t: t[1])
            print(
                "(eps = {:.2f}, delta = {}) at alpha = {} [worst node: {}; "
                "per-node eps: {}]".format(
                    worst[1], args.target_delta, worst[2], worst[0],
                    ", ".join(f"{w}={e:.2f}" for w, e, _ in per_node),
                )
            )
        if (epoch % args.test_interval) == 0:
            _, matthews = run_eval(eval_step, params, state, val_loader, epoch,
                                   class_names, verbose)
            model_path = os.path.join(
                weights_dir, "{:s}_epoch_{:03d}.pt".format(
                    exp_name, epoch * max(args.repetitions_dataset, 1)))
            ckpt.save_model(model_path, epoch=epoch, params=params,
                            model_state=state,
                            opt_state={w: None for w in worker_names},
                            args=args, val_mean_std=(np.asarray(mean), np.asarray(std)))
            matthews_scores.append(matthews)
            model_paths.append(model_path)

    if not matthews_scores:
        # zero effective epochs (epochs < repetitions_dataset divides to
        # 0) or no test interval hit: nothing was trained/selected
        if verbose:
            print(f"Nothing to do: no epochs ran (epochs={args.epochs})")
        for c in clients.values():
            c.close()
        return 0.0

    rev = np.array(matthews_scores)[::-1]
    best_idx = int(np.argmax(rev))
    highest = len(rev) - best_idx - 1
    shutil.copyfile(model_paths[highest],
                    os.path.join(weights_dir, f"final_{exp_name}.pt"))
    if args.save_file:
        ckpt.save_config_results(args, float(rev[best_idx]), timestamp)
    for p in model_paths:
        os.remove(p)
    for c in clients.values():
        c.close()
    return float(rev[best_idx])


def main_federated(args: Arguments, verbose: bool = True, optuna_trial=None,
                   weights_dir: str = "model_weights") -> float:
    if args.websockets:
        return main_federated_ws(args, verbose=verbose, weights_dir=weights_dir)
    timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_name = "federated_{:s}_{:s}".format(args.data_dir.replace("/", ""), timestamp)

    from primia_tpu.train.monitor import Monitor, NullMonitor

    mon = Monitor(exp_name) if args.visdom else NullMonitor()
    if args.visdom and verbose:
        print(f"Live dashboard: {mon.html}")

    (worker_names, node_imgs, node_labels, val_imgs, val_labels, mean, std,
     class_names) = setup_federated(args, verbose)
    n_nodes = len(worker_names)
    num_classes = len(class_names)

    model_def = create_model(args, num_classes=num_classes)
    key = jax.random.PRNGKey(args.seed)
    params0, state0 = model_def.init(jax.random.fold_in(key, 0))

    cw = None
    if args.weight_classes:
        cw = calc_class_weights(np.concatenate(node_labels), num_classes)

    optimizer = make_optimizer(args)
    scheduler = make_scheduler(args)
    # per-node DP-SGD composes with secure aggregation here (the
    # reference hard-exits on --train_federated + DP, train.py:310):
    # the DP step has the same signature as the plain one, so the node
    # axis vmaps over it unchanged, and each node's clipped+noised
    # update is then securely aggregated like any other
    from primia_tpu.train.dp import select_train_step

    train_step_raw = select_train_step(model_def, optimizer, args, mean, std,
                                       cw, donate=False, jit_compile=False)
    # one program for all nodes: vmap over the stacked node axis, with
    # the inactive-node masking fused in, under ONE outer jit. (An outer
    # vmap around an inner jit re-traces the whole step on every call.)
    _fed_vmapped = jax.vmap(train_step_raw, in_axes=(0, 0, 0, 0, 0, None))

    def _fed_step_masked(st, node_keys, imgs, labs, masks, lr, act):
        new_st, loss = _fed_vmapped(st, node_keys, imgs, labs, masks, lr)

        def mask_leaf(new, old):
            m = act.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m > 0, new, old)

        return jax.tree.map(mask_leaf, new_st, st), loss

    fed_step = jax.jit(_fed_step_masked, donate_argnums=(0,))
    eval_step = build_eval_step(model_def, args, mean, std, cw)

    start_at_epoch = 1
    if args.resume_checkpoint:
        # the (x -> federated) half of the reference's 4-way resume
        # (train.py:345-389): broadcast the checkpoint model to every
        # node; per-worker optimizer state is restored only when it was
        # saved per-worker AND keep_optim_dict asks for it
        ck = ckpt.load_model(args.resume_checkpoint)
        start_at_epoch = int(ck["epoch"]) + 1
        params0 = ck["model_state_dict"]["params"]
        state0 = ck["model_state_dict"]["state"]
        if verbose:
            print(f"Resuming from {args.resume_checkpoint} at epoch {start_at_epoch}")

    # stacked replicas, all initialized from the same weights (the
    # reference broadcasts one model to every worker)
    stacked = _stack_tree([TrainState(params0, state0, optimizer.init(params0))
                           for _ in range(n_nodes)])
    if args.resume_checkpoint and args.keep_optim_dict:
        osd = ck["optim_state_dict"]
        if (isinstance(osd, dict) and set(osd) >= set(worker_names)
                and all(osd[w] is not None for w in worker_names)):
            stacked = TrainState(
                stacked.params, stacked.model_state,
                _stack_tree([osd[w] for w in worker_names]),
            )
            if verbose:
                print("Restored per-worker optimizer state")

    # node shards live in HBM when they fit: per-step batch assembly
    # becomes on-device gathers + one jnp.stack (no host transfers)
    node_imgs = [to_device_resident(x) for x in node_imgs]
    loaders = [
        BatchLoader(node_imgs[i], node_labels[i], args.batch_size, shuffle=True,
                    seed=args.seed + i, pad_final=True)
        for i in range(n_nodes)
    ]
    num_batches = [len(l) * max(args.repetitions_dataset, 1) for l in loaders]
    total_batches = sum(num_batches)
    if args.weighted_averaging:
        agg_weights = np.array([nb / total_batches for nb in num_batches])
    else:
        agg_weights = np.full(n_nodes, 1.0 / n_nodes)

    val_loader = BatchLoader(val_imgs, val_labels, max(args.test_batch_size, 64),
                             shuffle=False, pad_final=True)

    agg_round = [0]  # fresh dealer randomness per sync: repeated masks
    # would let a party cancel them across rounds and see update deltas

    # the whole aggregation (encode -> share -> node-sum -> reveal ->
    # re-broadcast) must be ONE compiled program: eagerly it is ~1000
    # small dispatches per sync (~30s/epoch through a tunneled link)
    @jax.jit
    def _agg_core(p, s, agg_key):
        tree = {"params": p, "state": s}
        if args.unencrypted_aggregation:
            agg = plain_fedavg(tree, agg_weights)
        else:
            agg = secure_fedavg(agg_key, tree, agg_weights,
                                args.precision_fractional)
        bp = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_nodes, *a.shape)), agg["params"]
        )
        bs = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_nodes, *a.shape)), agg["state"]
        )
        return bp, bs

    stacked_opt_init = jax.jit(jax.vmap(optimizer.init))

    # DP parameter averaging of the AGGREGATED model (same
    # post-processing as the local loop, train/loop.py): eval and
    # checkpoints read the EMA across aggregation rounds
    _ema_decay = float(getattr(args, "parameter_ema", 0.0) or 0.0)
    _use_ema = args.differentially_private and 0.0 < _ema_decay < 1.0
    _ema = {"p": None}
    _ema_upd = jax.jit(lambda e, q: jax.tree.map(
        lambda a, b: _ema_decay * a + (1.0 - _ema_decay) * b, e, q))

    def aggregate(st: TrainState) -> TrainState:
        agg_round[0] += 1
        agg_key = jax.random.fold_in(jax.random.fold_in(key, 777), agg_round[0])
        new_params, new_state = _agg_core(st.params, st.model_state, agg_key)
        if _use_ema:
            p0 = _index_tree(new_params, 0)
            _ema["p"] = p0 if _ema["p"] is None else _ema_upd(_ema["p"], p0)
        opt = stacked_opt_init(new_params) if not args.keep_optim_dict else st.opt_state
        return TrainState(new_params, new_state, opt)

    def local_model(st: TrainState):
        # after aggregate() every replica holds the aggregated model;
        # under DP+EMA the evaluated/saved model is the averaged one
        p0 = (_ema["p"] if (_use_ema and _ema["p"] is not None)
              else _index_tree(st.params, 0))
        return p0, _index_tree(st.model_state, 0)

    run_eval(eval_step, *local_model(stacked), val_loader, 0, class_names, verbose)

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

    rng_key = jax.random.fold_in(key, 99)
    try:
        for epoch in range(start_at_epoch, args.epochs + 1):
            lr = scheduler.get_lr(epoch - 1)
            if not args.keep_optim_dict:
                stacked = TrainState(stacked.params, stacked.model_state,
                                     stacked_opt_init(stacked.params))
            iters = [iter(l) for l in loaders]
            reps_done = [0] * n_nodes
            losses = []
            max_b = max(num_batches)
            for batch_idx in range(max_b):
                imgs, labs, masks, active = [], [], [], []
                for i in range(n_nodes):
                    if batch_idx >= num_batches[i]:
                        imgs.append(jnp.zeros((args.batch_size, *node_imgs[i].shape[1:]),
                                              jnp.uint8))
                        labs.append(np.zeros(args.batch_size, np.int32))
                        masks.append(np.zeros(args.batch_size, np.float32))
                        active.append(0.0)
                        continue
                    try:
                        b = next(iters[i])
                    except StopIteration:
                        reps_done[i] += 1
                        iters[i] = iter(loaders[i])
                        b = next(iters[i])
                    imgs.append(b.images)
                    labs.append(b.labels)
                    masks.append(b.mask)
                    active.append(1.0)
                rng_key, sk = jax.random.split(rng_key)
                node_keys = jax.random.split(sk, n_nodes)
                stacked, loss = fed_step(
                    stacked, node_keys, jnp.stack(imgs),
                    jnp.asarray(np.stack([np.asarray(l) for l in labs])),
                    jnp.asarray(np.stack([np.asarray(m) for m in masks])), lr,
                    jnp.asarray(active),
                )
                # defer host syncs to epoch end: one device fetch per batch
                # would serialize the loop against the link latency
                losses.append((loss, active))

                if batch_idx > 0 and batch_idx % args.sync_every_n_batch == 0:
                    stacked = aggregate(stacked)
            stacked = aggregate(stacked)
            # ONE batched device fetch for the epoch's losses (each blocking
            # per-batch fetch pays the full link round-trip)
            fetched = jax.device_get([dev for dev, _ in losses])
            epoch_losses = [
                float(l)
                for dev, (_, act) in zip(fetched, losses)
                for l, a in zip(dev, act)
                if a
            ]
            mon.add_scalar("train_loss", epoch, float(np.mean(epoch_losses)))
            mon.add_scalar("lr", epoch, float(lr))
            if verbose:
                print("Train Epoch: {} \tLoss: {:.6f}".format(
                    epoch, float(np.mean(epoch_losses))))
            if args.differentially_private and verbose:
                # per-node accounting: each node's mechanism only ever
                # touches that node's shard, so its epsilon is the
                # subsampled-Gaussian RDP bound at its own sampling
                # rate/step count; the report leads with the worst node
                from primia_tpu.train.dp import rdp_epsilon

                per_node = []
                for i, w in enumerate(worker_names):
                    n_i = int(node_imgs[i].shape[0])
                    eps, alpha = rdp_epsilon(
                        noise_multiplier=args.noise_multiplier,
                        sample_rate=min(args.batch_size / max(n_i, 1), 1.0),
                        steps=epoch * num_batches[i],
                        delta=args.target_delta,
                    )
                    per_node.append((w, eps, alpha))
                worst = max(per_node, key=lambda t: t[1])
                print(
                    "(eps = {:.2f}, delta = {}) at alpha = {} [worst node: "
                    "{}; per-node eps: {}]".format(
                        worst[1], args.target_delta, worst[2], worst[0],
                        ", ".join(f"{w}={e:.2f}" for w, e, _ in per_node),
                    )
                )

            if (epoch % args.test_interval) == 0:
                val_loss, matthews = run_eval(eval_step, *local_model(stacked), val_loader,
                                              epoch, class_names, verbose)
                mon.add_scalar("val_loss", epoch, float(val_loss))
                mon.add_scalar("val_mcc", epoch, float(matthews))
                model_path = os.path.join(
                    weights_dir,
                    "{:s}_epoch_{:03d}.pt".format(
                        exp_name, epoch * max(args.repetitions_dataset, 1)
                    ),
                )
                if optuna_trial is not None:
                    optuna_trial.report(matthews, epoch * max(args.repetitions_dataset, 1))
                    if optuna_trial.should_prune():
                        from primia_tpu.train.hpo import TrialPruned

                        raise TrialPruned()
                lp, ls = local_model(stacked)
                submit_save(
                    path=model_path, epoch=epoch, params=lp, model_state=ls,
                    opt_state={w: _index_tree(stacked.opt_state, i)
                               for i, w in enumerate(worker_names)},
                    args=args, val_mean_std=(np.asarray(mean), np.asarray(std)),
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
        # zero effective epochs (epochs < repetitions_dataset divides to
        # 0) or no test interval hit: nothing was trained/selected
        if verbose:
            print(f"Nothing to do: no epochs ran (epochs={args.epochs})")
        return 0.0

    rev = np.array(matthews_scores)[::-1]
    best_idx = int(np.argmax(rev))
    highest = len(rev) - best_idx - 1
    best_file = model_paths[highest]
    if verbose:
        print(
            "Highest matthews coefficient was {:.1f}% in epoch {:d}".format(
                rev[best_idx],
                (highest + 1) * args.test_interval * max(args.repetitions_dataset, 1),
            )
        )
    shutil.copyfile(best_file, os.path.join(weights_dir, f"final_{exp_name}.pt"))
    if args.save_file:
        ckpt.save_config_results(args, float(rev[best_idx]), timestamp)
    for p in model_paths:
        os.remove(p)
    return float(rev[best_idx])
