"""Grid node server — the reference's ``python -m Node`` re-thought.

The reference node (``Node/__main__.py``, ``Node/app/__init__.py``) is a
Flask + gevent-websocket + SQLAlchemy server that executes arbitrary
syft tensor commands message-by-message. Here the node is a *data and
compute endpoint* with a small typed RPC surface (msgpack frames over a
WebSocket, plus an HTTP POST fallback — the reference's
``--http_protocol`` escape hatch, ``data_centric_fl_client.py:150-213``):

- ``status``                       -> identity + hosted tags
- ``search [tags]``                -> matching tags
- ``get_obj tag``                  -> hosted arrays (e.g. #datamean)
- ``get_data_shares tag seed``     -> 2-party additive shares of the
  node's data in the fixed-point ring: what leaves the node for
  encrypted inference is a share stream, never the plaintext
- ``train_round params config``    -> run local training steps on the
  node's own shard, return updated params + batch count: raw data never
  leaves the node in federated training (true to the reference's
  pointer semantics, without the per-op message storm — one RPC per
  round instead of one per tensor op)

Boot-time data hosting mirrors ``Node/app/__init__.py:235-388``:
a data_owner hosts ``#inference_data``; a training worker hosts
``#traindata/#traintargets/#datamean/#datastd``.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from primia_tpu.serve.protocol import pack, unpack


class GridNode:
    def __init__(self, node_id: str, data_directory: Optional[str] = None,
                 config: Optional[str] = None, mean_std_file: Optional[str] = None,
                 inference_resolution: int = 224, channels: int = 1,
                 storage_dir: Optional[str] = None,
                 auth_secret: Optional[bytes] = None,
                 num_replicas: int = 1):
        self.id = node_id
        self.store: Dict[str, np.ndarray] = {}
        self.models: Dict[str, dict] = {}  # hosted models (serve_model)
        self.plans: Dict[str, bytes] = {}  # hosted plans (serve/plan.py)
        self._plan_cache: Dict[str, object] = {}
        # authenticated identity: when a secret is set, every mutating or
        # gated verb requires a valid HS256 JWT and the acting user is
        # the token's ``sub`` — client-asserted ``user`` fields are then
        # ignored (reference JWT auth, model_centric/routes.py:37-90)
        self.auth_secret = auth_secret
        # hosted-model replica slots (--num_replicas fault tolerance,
        # reference Node/__main__.py:44-49): inference fails over to the
        # next healthy replica
        self.num_replicas = max(1, int(num_replicas))
        self.replicas: Dict[str, list] = {}
        # model-centric FL processes (serve/model_centric.py)
        self.fl_processes: Dict[str, object] = {}
        # disk-backed warehouse: hosted state survives restart
        # (restored below, once the ACL map exists)
        self.warehouse = None
        if storage_dir:
            from primia_tpu.serve.warehouse import Warehouse

            self.warehouse = Warehouse(storage_dir)
        # per-tag allowed-users gate — the PrivateTensor role
        # (syft/.../interpreters/private.py): an object hosted with an
        # allowed_users list is invisible to and unfetchable by others
        self.acl: Dict[str, frozenset] = {}
        # node-private share-stream secret: the client-supplied seed only
        # makes the two parties' requests CONSISTENT; the actual mask is
        # keyed by this secret, so no requester can recompute the other
        # party's share and reconstruct the plaintext
        import os as _os

        self._share_secret = _os.urandom(16)
        self.config_path = config
        self.inference_resolution = inference_resolution
        self.channels = channels
        if config:
            from primia_tpu.config import Arguments

            self.args = Arguments.from_ini(config, mode="train")
            self.inference_resolution = self.args.inference_resolution
            self.channels = 1 if not self.args.pretrained else 3
        else:
            self.args = None
        if self.warehouse is not None:
            self._restore_from_warehouse()
        if data_directory:
            self._host_data(Path(data_directory), mean_std_file)

    def _host_data(self, data_dir: Path, mean_std_file: Optional[str]):
        from primia_tpu.data import (
            ImageFolderDataset,
            PathDataset,
            calc_mean_std,
        )

        has_classes = any(p.is_dir() for p in data_dir.iterdir())
        if self.id == "data_owner" or not has_classes:
            ds = PathDataset(data_dir, channels=self.channels)
            imgs, _ = ds.materialize(self.inference_resolution)
            self.store["#inference_data"] = imgs
            if mean_std_file:
                ms = np.load(mean_std_file)
                self.store["#datamean"], self.store["#datastd"] = ms["mean"], ms["std"]
        else:
            ds = ImageFolderDataset(data_dir, channels=self.channels)
            imgs, labels = ds.materialize(self.inference_resolution)
            mean, std = calc_mean_std(imgs)
            self.store["#traindata"] = imgs
            self.store["#traintargets"] = labels
            self.store["#datamean"] = np.asarray(mean)
            self.store["#datastd"] = np.asarray(std)

    def _restore_from_warehouse(self):
        """Reload persisted objects/models/plans/FL processes at boot
        (the restart contract; reference SQLAlchemy warehouse,
        ``Node/app/main/core/``)."""
        from primia_tpu.serve.model_centric import FLProcess

        for tag, (arr, users) in self.warehouse.load_objects().items():
            self.store[tag] = arr
            if users:
                self.acl[tag] = frozenset(users)
        for name in self.warehouse.list_models():
            payload, meta = self.warehouse.get_model(name)
            self.models[name] = {**payload, **meta,
                                 "mean": np.asarray(payload["mean"]),
                                 "std": np.asarray(payload["std"])}
            self.replicas[name] = [
                {"healthy": True} for _ in range(self.num_replicas)]
        for name in self.warehouse.list_plans():
            self.plans[name] = self.warehouse.get_plan(name)
        for name in self.warehouse.list_processes():
            state, payload = self.warehouse.get_process(name)
            self.fl_processes[name] = FLProcess.from_state(
                state, payload["params"], payload.get("plan_blob"))

    # ------------------------------------------------------------ handlers

    def _authenticate(self, msg: dict):
        """Returns JWT claims when auth is enabled (raising on bad or
        missing tokens for gated verbs), else None."""
        from primia_tpu.serve.auth import AuthError, verify_token

        if self.auth_secret is None:
            return None
        token = msg.get("token")
        if not token:
            raise AuthError("authentication required")
        return verify_token(self.auth_secret, token)

    def _permitted(self, tag: str, msg: dict) -> bool:
        """allowed-users gate (reference PrivateTensor ``allowed_users``
        + GetNotPermittedError semantics). With auth enabled the acting
        user is the verified token subject, not a client-asserted field."""
        allowed = self.acl.get(tag)
        if allowed is None:
            return True
        if self.auth_secret is not None:
            from primia_tpu.serve.auth import AuthError

            try:
                claims = self._authenticate(msg)
            except AuthError:
                return False
            return claims["sub"] in allowed
        return msg.get("user") in allowed

    def _require(self, msg: dict, capability: str):
        """Auth-gate a verb on a role capability when auth is enabled."""
        from primia_tpu.serve.auth import require

        claims = self._authenticate(msg)
        if claims is not None:
            require(claims, capability)
        return claims

    def handle(self, msg: dict) -> dict:
        from primia_tpu.serve.auth import AuthError

        try:
            return self._dispatch(msg)
        except AuthError as e:
            return {"error": f"auth: {e}"}

    def _dispatch(self, msg: dict) -> dict:
        op = msg.get("type")
        if op is not None and str(op).startswith("fl_"):
            return self._handle_model_centric(op, msg)
        if op == "status":
            return {"id": self.id, "tags": sorted(
                t for t in self.store if self._permitted(t, msg))}
        if op == "search":
            q = msg.get("query", [])
            return {"results": [t for t in self.store
                                if (t in q or not q) and self._permitted(t, msg)]}
        if op == "get_obj":
            tag = msg["tag"]
            if tag not in self.store or not self._permitted(tag, msg):
                # identical answer whether absent or private: existence
                # of a private object is itself private
                return {"error": f"no object tagged {tag}"}
            return {"tag": tag, "array": self.store[tag]}
        if op == "load_data":
            self._require(msg, "host")
            self.store[msg["tag"]] = msg["array"]
            if msg.get("allowed_users"):
                self.acl[msg["tag"]] = frozenset(msg["allowed_users"])
            else:
                self.acl.pop(msg["tag"], None)
            if self.warehouse is not None:
                self.warehouse.put_object(
                    msg["tag"], msg["array"], msg.get("allowed_users"))
            return {"ok": True}
        if op == "delete_obj":
            tag = msg["tag"]
            # one answer for absent AND unpermitted: existence of a
            # private object is itself private
            if tag not in self.store or not self._permitted(tag, msg):
                return {"error": f"no object tagged {tag}"}
            self.store.pop(tag, None)
            self.acl.pop(tag, None)
            if self.warehouse is not None:
                self.warehouse.delete_object(tag)
            return {"ok": True}
        if op == "get_data_shares":
            tag = msg.get("tag", "#inference_data")
            if tag in self.store and not self._permitted(tag, msg):
                return {"error": f"no object tagged {tag}"}
            return self._get_data_shares(msg)
        if op == "train_round":
            return self._train_round(msg)
        if op == "host_model":
            self._require(msg, "host")
            return self._host_model(msg)
        if op == "list_models":
            return {"models": sorted(self.models)}
        if op == "delete_model":
            self._require(msg, "host")
            self.models.pop(msg["name"], None)
            self.replicas.pop(msg["name"], None)
            if self.warehouse is not None:
                self.warehouse.delete_model(msg["name"])
            return {"ok": True}
        if op == "run_inference":
            return self._run_inference(msg)
        if op == "replica_status":
            name = msg["name"]
            if name not in self.replicas:
                return {"error": f"no model named {name!r}"}
            return {"name": name, "replicas": self.replicas[name]}
        if op == "set_replica_health":
            # admin/fault-injection hook (reference replicas fail when
            # their process dies; here health is an explicit flag)
            self._require(msg, "admin")
            name, idx = msg["name"], int(msg["replica"])
            if name not in self.replicas or not (
                    0 <= idx < len(self.replicas[name])):
                return {"error": "no such replica"}
            self.replicas[name][idx]["healthy"] = bool(msg["healthy"])
            return {"ok": True}
        if op == "host_plan":
            self._require(msg, "host")
            self.plans[msg["name"]] = msg["blob"]
            if self.warehouse is not None:
                self.warehouse.put_plan(msg["name"], msg["blob"])
            return {"ok": True, "name": msg["name"]}
        if op == "list_plans":
            return {"plans": sorted(self.plans)}
        if op == "get_plan":
            # plan download for local execution (reference plan fetch,
            # syft/messaging PlanCommandMessage "fetch_plan")
            if msg["name"] not in self.plans:
                return {"error": f"no plan named {msg['name']!r}"}
            return {"name": msg["name"], "blob": self.plans[msg["name"]]}
        if op == "run_plan":
            return self._run_plan(msg)
        return {"error": f"unknown message type {op!r}"}

    # ------------------------------------------- model-centric FL cycle
    # Reference: Node/app/main/routes/model_centric/routes.py:37-471
    # (/host-training, /cycle-request, /get-model, /get-plan, /report).

    def _persist_process(self, proc):
        if self.warehouse is not None:
            self.warehouse.put_process(
                proc.name, proc.to_state(),
                {"params": proc.params, "plan_blob": proc.plan_blob})

    def _handle_model_centric(self, op: str, msg: dict) -> dict:
        from primia_tpu.serve.model_centric import FLProcess

        if op == "fl_host_training":
            claims = self._require(msg, "host")
            proc = FLProcess(
                msg["name"], msg["params"],
                plan_blob=msg.get("plan_blob"),
                client_config=msg.get("client_config"),
                server_config=msg.get("server_config"),
            )
            self.fl_processes[msg["name"]] = proc
            self._persist_process(proc)
            return {"ok": True, "name": proc.name, "version": proc.version}
        name = msg.get("name")
        proc = self.fl_processes.get(name)
        if proc is None:
            return {"error": f"no FL process named {name!r}"}
        if op == "fl_cycle_request":
            claims = self._require(msg, "fl_participate")
            worker = claims["sub"] if claims else msg.get("worker_id", "anon")
            out = proc.request_cycle(worker, msg.get("model_version"))
            self._persist_process(proc)
            return out
        if op == "fl_get_model":
            return proc.get_model(msg.get("request_key", ""))
        if op == "fl_get_plan":
            return proc.get_plan(msg.get("request_key", ""))
        if op == "fl_report":
            out = proc.report(msg.get("request_key", ""),
                              {k: np.asarray(v)
                               for k, v in msg.get("diff", {}).items()})
            self._persist_process(proc)
            return out
        if op == "fl_status":
            return proc.status()
        return {"error": f"unknown message type {op!r}"}

    def _run_plan(self, msg: dict) -> dict:
        """Execute a hosted plan on supplied (or hosted) inputs."""
        from primia_tpu.serve.plan import Plan

        name = msg["name"]
        if name not in self.plans:
            return {"error": f"no plan named {name!r}"}
        plan = self._plan_cache.get(name)
        if plan is None:
            plan = Plan.deserialize(self.plans[name])
            self._plan_cache[name] = plan
        inputs = [np.asarray(a) for a in msg.get("inputs", [])]
        for tag in msg.get("input_tags", []):  # hosted-data inputs by tag
            if tag not in self.store or not self._permitted(tag, msg):
                return {"error": f"no object tagged {tag}"}
            inputs.append(self.store[tag])
        try:
            outs = plan.run_flat(inputs)
        except ValueError as e:
            return {"error": str(e)}
        return {"outputs": outs}

    # ------------------------------------------------- model hosting
    # The reference hosts (encrypted) models on grid nodes and serves
    # remote inference (PrivateGridNetwork.serve_model /
    # run_remote_inference, syft/grid/private_grid.py:18-113; Node model
    # routes, Node/app/main/routes/data_centric/routes.py).

    def _host_model(self, msg: dict) -> dict:
        name = msg["name"]
        self.models[name] = {
            "params": _unflatten(msg["params"]),
            "model_state": _unflatten(msg["model_state"]),
            "args": msg["args"],
            "mean": np.asarray(msg["mean"]),
            "std": np.asarray(msg["std"]),
            "allow_download": bool(msg.get("allow_download", False)),
            "allow_remote_inference": bool(msg.get("allow_remote_inference", True)),
        }
        # replica slots for serving fault tolerance (--num_replicas)
        self.replicas[name] = [
            {"healthy": True} for _ in range(self.num_replicas)]
        if self.warehouse is not None:
            m = self.models[name]
            self.warehouse.put_model(
                name,
                {"params": m["params"], "model_state": m["model_state"],
                 "mean": m["mean"], "std": m["std"]},
                {"args": m["args"], "allow_download": m["allow_download"],
                 "allow_remote_inference": m["allow_remote_inference"]},
            )
        return {"ok": True, "name": name, "replicas": self.num_replicas}

    def _run_inference(self, msg: dict) -> dict:
        import jax

        from primia_tpu.config import Arguments
        from primia_tpu.nn import create_model
        from primia_tpu.train.steps import build_predict_step

        name = msg["name"]
        if name not in self.models:
            return {"error": f"no model named {name!r}"}
        m = self.models[name]
        if not m["allow_remote_inference"]:
            return {"error": f"model {name!r} does not allow remote inference"}
        # replica failover: serve from the first healthy replica slot
        slots = self.replicas.get(name, [{"healthy": True}])
        serving = next((i for i, r in enumerate(slots) if r["healthy"]), None)
        if serving is None:
            return {"error": f"model {name!r}: all replicas unhealthy"}
        if "images" in msg:
            images = np.asarray(msg["images"])
        elif "#inference_data" in self.store:
            images = self.store["#inference_data"]
        else:
            return {"error": "no images supplied and no hosted #inference_data"}
        args = Arguments.from_dict(json.loads(m["args"]))
        # memoize the traced predict fn per (mode, protocol, seed): the
        # encrypted graph takes minutes to trace/compile cold
        cache_key = (bool(msg.get("encrypted")), msg.get("protocol", "snn"),
                     int(msg.get("seed", 0)))
        predict = m.setdefault("_predict_cache", {}).get(cache_key)
        if predict is None:
            model_def = create_model(args, num_classes=args.num_classes)
            if msg.get("encrypted"):
                from primia_tpu.mpc.inference import build_encrypted_predict

                predict = build_encrypted_predict(
                    model_def, args, m["mean"], m["std"],
                    seed=int(msg.get("seed", 0)),
                    protocol=msg.get("protocol", "snn"),
                )
            else:
                predict = build_predict_step(model_def, args, m["mean"], m["std"])
            m["_predict_cache"][cache_key] = predict
        logits = np.asarray(predict(m["params"], m["model_state"], images))
        return {"logits": logits, "predictions": logits.argmax(1).astype(np.int32),
                "replica": serving}

    def _get_data_shares(self, msg: dict) -> dict:
        """Fixed-point encode + 2-party split of a hosted tensor; only
        the requested party's share leaves (a deployment hands each
        party its own stream).

        The split runs through the native SHA-256-CTR share generator
        (``native/src/primia_native.cpp`` — the C++ analogue of the
        reference's Rust ``shaloop`` PRG, ``fss.py:532``), one OpenMP
        pass over the tensor; numpy fallback when the library is absent.
        """
        from primia_tpu import native
        from primia_tpu.mpc import fixed

        tag = msg.get("tag", "#inference_data")
        party = int(msg.get("party", -1))
        if tag not in self.store:
            return {"error": f"no object tagged {tag}"}
        data = self.store[tag]
        if data.dtype == np.uint8:  # normalize with hosted stats if present
            x = data.astype(np.float32) / 255.0
            if "#datamean" in self.store:
                m = self.store["#datamean"].reshape(1, 1, 1, -1)
                s = self.store["#datastd"].reshape(1, 1, 1, -1)
                x = (x - m) / s
        else:
            x = data
        frac = int(msg.get("frac_bits", fixed.DEFAULT_FRAC_BITS))
        # mask = PRG(node_secret || tag || client_seed): deterministic per
        # (tag, seed) so both parties' fetches line up, but unpredictable
        # to any requester (a client-chosen seed alone must never let
        # party 1 recompute party 0's mask and unmask the data)
        import hashlib

        seed_bytes = hashlib.sha256(
            self._share_secret + tag.encode() + str(int(msg.get("seed", 0))).encode()
        ).digest()
        s0, s1 = native.encode_and_share(x, frac, seed_bytes)
        if party in (0, 1):
            return {"tag": tag, "share": (s0 if party == 0 else s1),
                    "party": party, "frac_bits": frac}
        return {"tag": tag, "shares": np.stack([s0, s1]), "frac_bits": frac}

    def _train_round(self, msg: dict) -> dict:
        """Local training steps on the node's shard (federated ws mode)."""
        import jax
        import jax.numpy as jnp

        from primia_tpu.config import Arguments
        from primia_tpu.data import BatchLoader
        from primia_tpu.nn import create_model
        from primia_tpu.train.optim import make_optimizer
        from primia_tpu.train.steps import TrainState

        if "#traindata" not in self.store:
            return {"error": "node hosts no training data"}
        args = Arguments.from_dict(json.loads(msg["args"]))
        params = msg["params"]
        n_steps = int(msg["n_steps"])
        lr = float(msg["lr"])
        seed = int(msg.get("seed", 0))

        model_def = create_model(args, num_classes=int(msg.get("num_classes", 3)))
        optimizer = make_optimizer(args)
        mean = self.store["#datamean"]
        std = self.store["#datastd"]
        # DP-SGD runs node-side when the round's config asks for it:
        # clipping + noising happen where the raw data lives, so the
        # parameters this verb returns are already privatized
        from primia_tpu.train.dp import select_train_step

        step = select_train_step(model_def, optimizer, args, mean, std,
                                 donate=False)

        tree_params = _unflatten(params)
        model_state = _unflatten(msg["model_state"])
        ts = TrainState(tree_params, model_state, optimizer.init(tree_params))
        loader = BatchLoader(self.store["#traindata"], self.store["#traintargets"],
                             args.batch_size, shuffle=True, seed=seed, pad_final=True)
        key = jax.random.PRNGKey(seed)
        it = iter(loader)
        losses = []
        for _ in range(n_steps):
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                b = next(it)
            key, sk = jax.random.split(key)
            ts, loss = step(ts, sk, b.images, b.labels, b.mask, lr)
            losses.append(float(loss))
        return {
            "params": _flatten(jax.tree.map(np.asarray, ts.params)),
            "model_state": _flatten(jax.tree.map(np.asarray, ts.model_state)),
            "n_batches": len(loader),
            "loss": float(np.mean(losses)),
        }


def _flatten(tree) -> dict:
    """pytree -> {path_str: ndarray} for the wire."""
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out


def _unflatten(flat: dict):
    """Inverse of _flatten for dict/list trees keyed like "['a'][0]['b']"."""
    root: dict = {}
    for path_str, leaf in flat.items():
        keys = []
        for part in path_str.strip("[]").split("]["):
            part = part.strip()
            if part.startswith("'") or part.startswith('"'):
                keys.append(part.strip("'\""))
            else:
                keys.append(int(part))
        node = root
        for a, b in zip(keys, keys[1:]):
            nxt = node.get(a) if isinstance(node, dict) else (
                node[a] if a < len(node) else None)
            if nxt is None:
                nxt = [] if isinstance(b, int) else {}
                if isinstance(node, dict):
                    node[a] = nxt
                else:
                    while len(node) <= a:
                        node.append(None)
                    node[a] = nxt
            node = nxt
        last = keys[-1]
        if isinstance(node, list):
            while len(node) <= last:
                node.append(None)
            node[last] = leaf
        else:
            node[last] = leaf
    return _lists(root)


def _lists(node):
    if isinstance(node, dict):
        return {k: _lists(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_lists(v) for v in node]
    return node


# ======================================================================
# transports
# ======================================================================

class NodeServer:
    """WebSocket (primary) + HTTP POST (fallback) front-ends over one
    GridNode, mirroring the reference's dual transports."""

    def __init__(self, node: GridNode, host: str = "127.0.0.1", port: int = 8777):
        self.node = node
        self.host = host
        self.port = port
        self._ws_server = None
        self._http_server = None
        self._threads = []

    def _ws_handler(self, ws):
        for frame in ws:
            try:
                reply = self.node.handle(unpack(frame))
            except Exception as e:  # serialized back like websocket_server.py:126
                reply = {"error": f"{type(e).__name__}: {e}"}
            ws.send(pack(reply))

    def start(self):
        from websockets.sync.server import serve

        self._ws_server = serve(self._ws_handler, self.host, self.port)
        t = threading.Thread(target=self._ws_server.serve_forever, daemon=True)
        t.start()
        self._threads.append(t)

        node = self.node

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                frame = self.rfile.read(length)
                try:
                    reply = node.handle(unpack(frame))
                except Exception as e:
                    reply = {"error": f"{type(e).__name__}: {e}"}
                body = pack(reply)
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802  (status/identity endpoint)
                body = json.dumps(node.handle({"type": "status"})).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self._http_server = ThreadingHTTPServer((self.host, self.port + 1000), Handler)
        t2 = threading.Thread(target=self._http_server.serve_forever, daemon=True)
        t2.start()
        self._threads.append(t2)
        return self

    def stop(self):
        if self._ws_server:
            self._ws_server.shutdown()
        if self._http_server:
            self._http_server.shutdown()


def main(argv=None):
    parser = argparse.ArgumentParser(description="primia-tpu grid node")
    parser.add_argument("--id", type=str, required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--data_directory", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--mean_std_file", type=str, default=None)
    parser.add_argument("--storage_dir", type=str, default=None,
                        help="disk-backed warehouse: hosted models/plans/"
                             "objects survive restart")
    parser.add_argument("--num_replicas", type=int, default=1,
                        help="hosted-model replica slots (reference "
                             "Node/__main__.py:44-49)")
    a = parser.parse_args(argv)
    # auth secret via env, like the reference's SECRET_KEY
    # (Node/__main__.py:22-49); unset -> unauthenticated node
    import os

    secret = os.environ.get("SECRET_KEY")
    node = GridNode(a.id, a.data_directory, a.config, a.mean_std_file,
                    storage_dir=a.storage_dir,
                    auth_secret=secret.encode() if secret else None,
                    num_replicas=a.num_replicas)
    server = NodeServer(node, a.host, a.port).start()
    print(f"node {a.id} serving ws://{a.host}:{a.port} "
          f"(http fallback :{a.port + 1000})", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
