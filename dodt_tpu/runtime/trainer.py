"""Training runtime: optax optimizer, pjit data-parallel step, orbax
checkpoints, named-subtree transfer learning.

Replaces the reference trainer (trainer.py:27, trainer_stride.py,
stack_trainer.py): the feed_dict loop becomes a jitted sharded step; the
brittle index-sliced variable freezing/restoring (trainer.py:160-183)
becomes named parameter-subtree restore + gradient masking.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dodt_tpu.config import PipelineConfig
from dodt_tpu.models import dt_avod
from dodt_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def make_lr_schedule(cfg):
    opt = cfg.train.optimizer
    return optax.exponential_decay(
        init_value=opt.initial_lr,
        transition_steps=opt.decay_steps,
        decay_rate=opt.decay_factor,
        staircase=opt.staircase)


def make_optimizer(cfg: PipelineConfig,
                   frozen_mask=None) -> optax.GradientTransformation:
    """Adam + exp-decay LR + global-norm clip 1.0 (reference
    optimizer_builder.build:23 + slim create_train_op clip, trainer.py:97).
    `frozen_mask`: pytree of bools, True = zero the gradient (named
    replacement for index-slice freezing)."""
    opt = cfg.train.optimizer
    schedule = make_lr_schedule(cfg)
    chain = [optax.clip_by_global_norm(opt.grad_clip_norm)]
    if opt.name == "adam":
        chain.append(optax.adam(schedule))
    elif opt.name == "momentum":
        chain.append(optax.sgd(schedule, momentum=0.9))
    elif opt.name == "rmsprop":
        chain.append(optax.rmsprop(schedule))
    else:
        chain.append(optax.sgd(schedule))
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask), tx)
    return tx


def frozen_mask_from_subtrees(params, frozen_subtrees) -> Any:
    """True for leaves under any of the named top-level subtrees."""
    def rule(path, _):
        keys = [getattr(p, "key", "") for p in path]
        return any(k in frozen_subtrees for k in keys)
    return jax.tree_util.tree_map_with_path(rule, params)


def create_train_state(cfg: PipelineConfig, model, batch,
                       rng) -> TrainState:
    # jit the init: one compiled evaluation instead of thousands of
    # eager op dispatches (matters on CPU test meshes; free on TPU)
    init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
    variables = init_fn(
        {"params": rng, "dropout": rng, "pathdrop": rng}, batch,
        train=False, mode="val")
    params = variables["params"]
    # Always build the (possibly all-False) frozen mask so the optimizer
    # chain — and therefore the opt_state pytree structure — is
    # identical across staged/finetune/scratch configs of the same
    # model. That makes the FULL TrainState (Adam moments, LR-schedule
    # count) restorable across stages of the staged flow, matching the
    # reference's full-saver restore semantics (trainer.py:156-157).
    frozen = frozen_mask_from_subtrees(params,
                                       cfg.train.frozen_subtrees or ())
    tx = make_optimizer(cfg, frozen)
    opt_state = tx.init(params)
    ema = params if cfg.train.optimizer.use_moving_average else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, ema_params=ema)


def make_train_step(cfg: PipelineConfig, model, mesh=None):
    """Returns a jitted train step: (state, batch, rng) -> (state, losses).

    Data parallelism: batch leading axis sharded over the mesh 'data'
    axis; with params replicated, XLA emits the gradient all-reduce
    (psum) over ICI automatically.
    """
    frozen = None
    tx_holder = {}
    loss_builder = (model.loss_builder()
                    if hasattr(model, "loss_builder")
                    else dt_avod.compute_losses)

    def get_tx(params):
        if "tx" not in tx_holder:
            # always-masked chain — must match create_train_state so the
            # opt_state structures agree (see comment there)
            f = frozen_mask_from_subtrees(params,
                                          cfg.train.frozen_subtrees or ())
            tx_holder["tx"] = make_optimizer(cfg, f)
        return tx_holder["tx"]

    def step_fn(state: TrainState, batch: Dict[str, Any], rng):
        drop_rng, path_rng, samp_rng = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)

        def loss_fn(params):
            out = model.apply({"params": params}, batch, train=True,
                              mode="train",
                              rngs={"dropout": drop_rng,
                                    "pathdrop": path_rng,
                                    "sampling": samp_rng})
            total, losses = loss_builder(cfg, out, batch, samp_rng)
            return total, losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        tx = get_tx(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            decay = cfg.train.optimizer.moving_average_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1 - decay) * p, ema, new_params)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, ema_params=ema)
        return new_state, losses

    # With a mesh, the batch is device_put with a 'data' sharding by the
    # caller (mesh_lib.shard_batch) and params stay replicated — jit
    # propagates the shardings and XLA inserts the gradient all-reduce.
    del frozen
    return jax.jit(step_fn, donate_argnums=0)


# ---------------------------------------------------------------------------
# Checkpointing (orbax)
# ---------------------------------------------------------------------------

class CheckpointIO:
    """Thin orbax wrapper with named-subtree partial restore."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 10000):
        import orbax.checkpoint as ocp
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: TrainState):
        """Full train state: params + optimizer moments + EMA params.

        The reference's slim training saves the whole graph collection
        (Adam slots + ExponentialMovingAverage shadows) in its
        checkpoints (trainer.py:94-119, optimizer.proto moving_average);
        here that is the explicit TrainState pytree.
        """
        import orbax.checkpoint as ocp
        payload = {"params": state.params, "step": int(step),
                   "opt_state": state.opt_state}
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def all_steps(self):
        # read=True re-lists the directory instead of trusting this
        # manager's in-process cache: in the eval-while-train deployment
        # (reference README.md:416, dt_evaluator.py:461-533) a SEPARATE
        # trainer process writes checkpoints into this dir, which the
        # cached view would never see
        return sorted(self.manager.all_steps(read=True))

    def restore_params(self, step: Optional[int] = None,
                       prefer_ema: bool = False):
        """Params for inference/eval; with `prefer_ema`, the EMA shadow
        params are returned when the checkpoint carries them (the
        reference evaluates its moving average the same way)."""
        import orbax.checkpoint as ocp
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore())
        if prefer_ema and restored.get("ema_params") is not None:
            return restored["ema_params"]
        return restored["params"]

    def restore_state(self, template: TrainState,
                      step: Optional[int] = None) -> Optional[TrainState]:
        """Restore the FULL train state (params, optimizer moments, EMA)
        into the structure of `template`, so a resumed run is
        step-for-step identical to an uninterrupted one. Falls back to
        params-only for old-format checkpoints."""
        import orbax.checkpoint as ocp
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        payload = {"params": template.params, "step": 0,
                   "opt_state": template.opt_state}
        if template.ema_params is not None:
            payload["ema_params"] = template.ema_params
        try:
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(payload))
        except (ValueError, KeyError):
            params = self.restore_params(step)
            return template._replace(
                params=params, step=jnp.asarray(step, jnp.int32))
        return TrainState(
            step=jnp.asarray(step, jnp.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params"))

    def restore_subtrees(self, params, source_dir: str,
                         subtrees=None, step: Optional[int] = None):
        """Named-subtree transfer restore (replaces reference
        trainer.py:160-183 index slicing): copies matching top-level
        subtrees from another experiment's checkpoint into `params`.

        `subtrees` sentinel: **None** means "all shared subtrees"
        (every top-level name present in both the source checkpoint and
        `params`); an explicit tuple restores exactly those names and
        RAISES if any is missing from the source or the target — a typo
        or architecture mismatch must not silently leave a subtree at
        its random init. `()` means restore nothing (expressible, but
        a config that sets pretrained_checkpoint with no subtrees gets
        the None default = everything shared)."""
        other = CheckpointIO(source_dir)
        src = other.restore_params(step)
        if src is None:
            raise FileNotFoundError(f"no checkpoint in {source_dir}")
        out = dict(params)
        if subtrees is None:
            names = [n for n in src.keys() if n in out]
        else:
            names = list(subtrees)
            missing = [n for n in names if n not in src or n not in out]
            if missing:
                raise KeyError(
                    f"pretrained_subtrees not found (src={source_dir}): "
                    f"{missing}; source has {sorted(src.keys())}, "
                    f"target has {sorted(out.keys())}")
        for name in names:
            out[name] = src[name]
        return type(params)(out) if not isinstance(params, dict) else out


# ---------------------------------------------------------------------------
# Trainer loop
# ---------------------------------------------------------------------------

class Trainer:
    def __init__(self, cfg: PipelineConfig, model, dataset,
                 ckpt_dir: str, mesh=None, batch_size: int = 1,
                 metrics_path: Optional[str] = "auto"):
        self.cfg = cfg
        self.model = model
        self.dataset = dataset
        self.mesh = mesh
        self.batch_size = batch_size
        self.ckpt = CheckpointIO(ckpt_dir,
                                 cfg.train.max_checkpoints_to_keep)
        # persistent train-time observability (reference TensorBoard
        # scalar summaries every summary_interval, trainer.py:108-116):
        # window-averaged losses appended as JSONL next to the
        # checkpoints, so a crashed/killed run leaves a readable
        # trainable-health trail on disk. Pass metrics_path=None to
        # disable (in-memory history only).
        from dodt_tpu.utils.metrics import MetricsLogger
        if metrics_path == "auto":
            metrics_path = os.path.join(ckpt_dir, "train_metrics.jsonl")
        self.metrics = MetricsLogger(metrics_path)
        if cfg.train.debug_nans:
            # numeric-sanitizer mode (the reference has none; nearest
            # analogue is tf.assert_positive in losses): every jit
            # re-runs in op-by-op mode on a NaN and raises at the
            # producing op
            jax.config.update("jax_debug_nans", True)
        self.step_fn = make_train_step(cfg, model, mesh)
        self.rng = jax.random.PRNGKey(42)
        self._spare_batches: list = []  # prefetched across train() calls

    def init_or_restore(self) -> TrainState:
        batch = self._device_batch(augment=False)
        state = create_train_state(self.cfg, self.model, batch, self.rng)
        latest = self.ckpt.latest_step()
        if latest is not None:
            state = self.ckpt.restore_state(state, latest)
        elif self.cfg.train.pretrained_checkpoint:
            if self.cfg.train.pretrained_full_state:
                # Stage-3 joint finetune semantics: the reference
                # re-launches with use_pretrained_model=False and the
                # FULL saver restores the previous checkpoint incl.
                # global_step and the Adam slots (trainer.py:156-157),
                # so the exponential-decay LR continues from its decayed
                # position instead of restarting at initial_lr with
                # zeroed moments.
                src = CheckpointIO(self.cfg.train.pretrained_checkpoint)
                restored = src.restore_state(state)
                if restored is None:
                    raise FileNotFoundError(
                        "pretrained_full_state: no checkpoint in "
                        f"{self.cfg.train.pretrained_checkpoint}")
                state = restored
            else:
                params = self.ckpt.restore_subtrees(
                    state.params, self.cfg.train.pretrained_checkpoint,
                    self.cfg.train.pretrained_subtrees)
                # keep the EMA shadow coherent with the restored params:
                # the evaluator prefers ema_params, which would otherwise
                # start from the fresh random init
                ema = params if state.ema_params is not None else None
                state = state._replace(params=params, ema_params=ema)
        if self.mesh is not None:
            # lay the state out over the mesh: replicated for pure-DP,
            # FC-trunk kernels (and their Adam moments / EMA shadows)
            # sharded over 'model' for TP — the jitted step propagates
            # these layouts, so XLA emits the TP collectives for real
            # training, not just the dryrun (VERDICT r4 item 9)
            state = mesh_lib.shard_train_state(state, self.mesh)
        return state

    def _device_batch(self, augment=True):
        batch = self.dataset.next_batch(self.batch_size, augment=augment)
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, list)}
        if self.mesh is not None:
            batch = mesh_lib.shard_batch(batch, self.mesh)
        return batch

    def train(self, max_steps: Optional[int] = None, log_every: int = 10,
              prefetch: int = 2):
        """Train loop with host/device overlap: a background thread
        loads + device_puts the next `prefetch` batches while the
        device runs the current step, so train-step wall time tracks
        device time instead of device + host time (the reference's
        feed_dict loop pays both serially — SURVEY section 3.1 hot
        loop; eliminated per SURVEY section 7 stage 8)."""
        state = self.init_or_restore()
        max_steps = max_steps or self.cfg.train.max_iterations
        history = []
        t0 = time.time()

        import queue
        import threading
        q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        stop = threading.Event()

        producer_err = []

        def _producer():
            try:
                while not stop.is_set():
                    batch = self._device_batch()
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surface instead of silent hang
                producer_err.append(e)
                stop.set()

        def _next_prefetched():
            """q.get that fails loudly if the producer died (a daemon
            thread exception would otherwise leave the train loop
            blocked forever on an empty queue). Consumes batches left
            over from a previous train() call first, so prefetching
            does not skip samples between calls."""
            if self._spare_batches:
                return self._spare_batches.pop(0)
            while True:
                try:
                    return q.get(timeout=5.0)
                except queue.Empty:
                    if producer_err:
                        raise RuntimeError(
                            "prefetch producer failed") from producer_err[0]
                    if not producer.is_alive():
                        raise RuntimeError("prefetch producer died")

        producer = None
        if prefetch > 0:
            producer = threading.Thread(target=_producer, daemon=True)
            producer.start()
        window = []  # device scalars; fetched only at log points
        # host-side step counter: fetching `int(state.step)` every
        # iteration is a blocking device round trip per step that also
        # prevents dispatch pipelining (the device sits idle while the
        # host waits); the counter only needs syncing once at entry
        step = int(state.step)
        try:
            while step < max_steps:
                batch = (_next_prefetched() if producer
                         else self._device_batch())
                state, losses = self.step_fn(state, batch, self.rng)
                window.append(losses)
                step += 1
                if step % log_every == 0 or step == max_steps:
                    # window-averaged losses: per-sample losses are far
                    # too noisy (batch 1) to read a trend from
                    losses = {k: float(jnp.mean(jnp.stack(
                        [w[k] for w in window])))
                        for k in window[0]}
                    window = []
                    losses["step"] = step
                    losses["wall_s"] = time.time() - t0
                    history.append(losses)
                    self.metrics.log(step, **{k: v for k, v
                                              in losses.items()
                                              if k != "step"})
                if step % self.cfg.train.checkpoint_interval == 0 or \
                        step == max_steps:
                    self.ckpt.save(step, state)
        finally:
            stop.set()
            if producer is not None:
                while producer.is_alive():
                    try:  # unblock a producer stuck on a full queue
                        self._spare_batches.append(q.get_nowait())
                    except queue.Empty:
                        pass
                    producer.join(timeout=0.2)
                while True:  # keep already-loaded batches for the next
                    try:     # train() call instead of dropping samples
                        self._spare_batches.append(q.get_nowait())
                    except queue.Empty:
                        break
        return state, history
