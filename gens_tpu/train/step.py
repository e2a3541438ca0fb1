"""Jit-compiled training steps (generalizable + finetune regimes).

Replaces the reference's Runner.train_epoch / finetune inner loops
(/root/reference/runner.py:139-197,284-377): forward, loss, Adam update with
per-group learning rates (gens.py:32-43) under a warmup-cosine schedule, as
one pure function. Data parallelism is a ``shard_map`` over the ``data``
mesh axis with psum gradient reduction — the DDP equivalent (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gens_tpu.config import Config, TrainConfig
from gens_tpu.losses import compute_losses
from gens_tpu.models.gens import GenSModel
from gens_tpu.train.schedule import warmup_cosine_factor


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 step counter


def _param_labels(params) -> Dict:
    """Label each top-level param subtree with its LR group
    (reference get_optim_params, gens.py:32-43). BatchNorm running stats
    (mnasnet backbone) are frozen, not adam-updated."""
    labels = {}
    for k, v in params.items():
        if k == "variance":
            # own LR group: reference-parity at lr_variance_mult=1.0 (it
            # then shares the mlp rate); the multiplier exists because the
            # NeuS inv_s scalar's growth rate sets the surface-localization
            # floor (QUALITY.md r05: held-out accuracy tracks ~1/inv_s, and
            # inv_s only reached 28 in the chip-budget-limited schedule vs
            # the hundreds the reference's 180k-step schedule reaches)
            labels[k] = "variance"
        elif k in ("sdf", "blending"):
            labels[k] = "mlp"
        elif k == "match_feature":
            labels[k] = jax.tree.map(lambda _: "frozen", v)
        elif isinstance(v, dict) and "batch_stats" in v:
            labels[k] = {kk: "frozen" if kk == "batch_stats" else "feat"
                         for kk in v}
        else:  # feature, reg
            labels[k] = "feat"
    return labels


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    def sched(base_lr):
        def fn(step):
            progress = step / steps_per_epoch
            return base_lr * warmup_cosine_factor(
                progress, tcfg.epochs, tcfg.warmup, tcfg.alpha)
        return fn

    return optax.multi_transform(
        {
            "mlp": optax.adam(sched(tcfg.lr_mlp)),
            "variance": optax.adam(
                sched(tcfg.lr_mlp * tcfg.lr_variance_mult)),
            "feat": optax.adam(sched(tcfg.lr_feat)),
            "frozen": optax.set_to_zero(),
        },
        _param_labels,
    )


def make_finetune_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Per-scale volume LRs + mlp LR (gens.py:40-43,
    confs/gens_finetune.conf:20-23)."""
    def sched(base_lr):
        def fn(step):
            return base_lr * warmup_cosine_factor(
                step, tcfg.epochs, tcfg.warmup, tcfg.alpha)
        return fn

    transforms = {"mlp": optax.adam(sched(tcfg.lr_mlp))}
    n_scales = len(tcfg.lr_vol)
    for i, lr in enumerate(tcfg.lr_vol):
        transforms[f"vol{i}"] = optax.adam(sched(lr))

    def labels(params):
        out = {}
        for k in params:
            if k == "volumes":
                out[k] = [f"vol{i}" for i in range(n_scales)]
            else:
                out[k] = "mlp"
        return out

    return optax.multi_transform(transforms, labels)


def psnr(pred, target):
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))


def make_train_step(model: GenSModel, cfg: Config, steps_per_epoch: int,
                    axis_name: Optional[str] = None):
    """Returns ``step_fn(state, inputs, key, cos_anneal_ratio,
    use_match_features) -> (state, metrics)``.

    ``inputs`` is one scene's batch (the reference trains batch-size-1 per
    device, datasets/__init__.py:11-17); under data parallelism each device
    receives its own scene and gradients are psum-averaged.
    """
    optimizer = make_optimizer(cfg.train, steps_per_epoch)

    def loss_fn(params, inputs, key, cos_anneal_ratio, use_match_features):
        outputs = model.forward_train(
            params, inputs, cos_anneal_ratio, use_match_features, key)
        losses = compute_losses(outputs, inputs, cfg.train.loss)
        metrics = dict(losses)
        metrics["psnr"] = psnr(outputs["color_fine"], inputs["color"])
        metrics["s_val"] = jnp.mean(outputs["s_val"])
        return losses["loss"], metrics

    @functools.partial(jax.jit, static_argnames=("use_match_features",))
    def step_fn(state: TrainState, inputs, key, cos_anneal_ratio,
                use_match_features: bool = False):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, inputs, key, cos_anneal_ratio, use_match_features)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return optimizer, step_fn


def init_train_state(model: GenSModel, cfg: Config, key,
                     steps_per_epoch: int) -> Tuple[TrainState, Any]:
    params = model.init_params(key, n_src_views=cfg.train_dataset.num_src_view)
    optimizer = make_optimizer(cfg.train, steps_per_epoch)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.asarray(0, jnp.int32)), optimizer


def sync_match_features(params):
    """Host-side resync of the frozen matching feature net from the live one
    (reference gens.py:133-138, every ``match_sync_every`` epochs)."""
    params = dict(params)
    params["match_feature"] = jax.tree.map(jnp.copy, params["feature"])
    return params
