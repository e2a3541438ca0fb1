"""Runner integration tests on the synthetic dataset: the validate path
(scene build -> mesh extraction -> chunked render -> images + metrics) and
the finetune path (volume init -> per-step optimization -> vol checkpoint)."""

import glob
import os
import tempfile

import jax
import numpy as np
import pytest

from gens_tpu.data.synthetic import SyntheticDataset
from gens_tpu.models.gens import GenSModel
from gens_tpu.runner import Runner, to_device
from tests.test_forward import tiny_config


@pytest.fixture(scope="module")
def runner_setup():
    cfg = tiny_config()
    cfg.mesh_resolution = 32
    tmp = tempfile.mkdtemp()
    cfg.base_exp_dir = tmp
    cfg.mode = "val"
    runner = Runner(cfg)
    params = runner.model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    return cfg, runner, params


def test_validate_pipeline(runner_setup):
    cfg, runner, params = runner_setup
    dataset = SyntheticDataset(n_scenes=1, hw=(64, 64), val_res_level=8,
                               mode="val")
    metrics = runner.validate(params, epoch=0, dataset=dataset)
    assert np.isfinite(metrics["psnr"])
    assert np.isfinite(metrics["render_depth_loss"])
    meshes = glob.glob(os.path.join(runner.exp_dir, "meshes", "*.ply"))
    assert meshes, "no mesh exported"
    imgs = glob.glob(os.path.join(runner.exp_dir, "val_img", "*.png"))
    assert imgs, "no val image exported"
    normals = glob.glob(os.path.join(runner.exp_dir, "val_normal", "*.png"))
    assert normals


def test_finetune_volume_init_and_step(runner_setup):
    """The finetune regime: one-shot volume build -> volumes become leaves of
    the optimized pytree -> one step updates them (gens.py:63-85)."""
    import optax
    import jax.numpy as jnp

    from gens_tpu.losses import compute_losses
    from gens_tpu.train.step import make_finetune_optimizer

    cfg, runner, params = runner_setup
    model = runner.model
    dataset = SyntheticDataset(n_scenes=1, hw=(64, 64), n_rays=16,
                               mode="finetune")
    init_inputs = to_device(dataset.get_all_images())
    volumes, mask_vols, features = model.init_volumes(
        params, init_inputs["imgs"], init_inputs["intrs"],
        init_inputs["c2ws"])
    assert len(volumes) == len(cfg.model.volume.volume_dims)

    ft_params = {"volumes": list(volumes), "sdf": params["sdf"],
                 "blending": params["blending"],
                 "variance": params["variance"]}
    static = {"mask_volumes": list(mask_vols), "features": list(features)}

    optimizer = make_finetune_optimizer(cfg.train)
    opt_state = optimizer.init(ft_params)

    inputs = to_device(dataset.get_random_rays(0))

    def loss_fn(p):
        out = model.forward_finetune(p, static, inputs, 1.0,
                                     jax.random.PRNGKey(0))
        return compute_losses(out, inputs, cfg.train.loss)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(ft_params)
    assert np.isfinite(float(loss))
    # gradients reach the volumes themselves (the finetune regime's point)
    gv = np.abs(np.asarray(grads["volumes"][0])).max()
    assert gv > 0, "no gradient on the fine volume"

    updates, opt_state = optimizer.update(grads, opt_state, ft_params)
    new_params = optax.apply_updates(ft_params, updates)
    delta = np.abs(np.asarray(new_params["volumes"][0])
                   - np.asarray(ft_params["volumes"][0])).max()
    assert delta > 0


def test_train_and_resume(runner_setup):
    """Single-device Runner.train end-to-end + checkpoint resume — the exact
    spot where the reference has its known resume-ordering bug
    (runner.py:83 before :97, SURVEY §7.5): params and the step counter must
    continue, not restart."""
    import dataclasses

    from gens_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    cfg, runner, _ = runner_setup
    cfg = dataclasses.replace(cfg)
    cfg.train_dataset = dataclasses.replace(
        cfg.train_dataset, dataset_name="synthetic", num_src_view=2,
        img_hw=(64, 64), n_rays=24, scene=("s0", "s1"))
    cfg.train = dataclasses.replace(cfg.train, epochs=2, save_freq=1,
                                    val_freq=100)
    runner = Runner(cfg, None)
    runner.cfg = cfg
    runner.mode = "train"
    runner.exp_dir = cfg.base_exp_dir

    runner.train()
    assert int(runner.state.step) == 4  # 2 epochs x 2 scenes

    ckpt_path = latest_checkpoint(
        os.path.join(runner.exp_dir, "checkpoints"))
    assert ckpt_path
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["epoch"] == 1 and ckpt["step"] == 4

    # resume: one more epoch continues from epoch 2 / step 4
    cfg2 = dataclasses.replace(cfg)
    cfg2.train = dataclasses.replace(cfg.train, epochs=3)
    runner2 = Runner(cfg2, None)
    runner2.cfg = cfg2
    runner2.mode = "train"
    runner2.exp_dir = cfg.base_exp_dir
    runner2.train(resume=ckpt_path)
    assert int(runner2.state.step) == 6
    # resumed params differ from the checkpoint (training continued)
    leaf0 = jax.tree_util.tree_leaves(ckpt["params"]["sdf"])[0]
    leaf1 = jax.tree_util.tree_leaves(runner2.state.params["sdf"])[0]
    assert np.abs(np.asarray(leaf0) - np.asarray(leaf1)).max() > 0


def test_preemption_signal_and_resume(runner_setup):
    """SIGTERM mid-train -> flag set (not process death) -> preempt.ckpt
    written at the next check point -> --resume auto continues from it and
    completes the remaining epochs (the framework's elastic-recovery story;
    the reference has none, SURVEY §5)."""
    import dataclasses
    import signal

    cfg, _, _ = runner_setup
    cfg = dataclasses.replace(cfg)
    cfg.train_dataset = dataclasses.replace(
        cfg.train_dataset, dataset_name="synthetic", num_src_view=2,
        img_hw=(64, 64), n_rays=24, scene=("s0", "s1"))
    cfg.train = dataclasses.replace(cfg.train, epochs=2, save_freq=100,
                                    val_freq=100)
    cfg.base_exp_dir = tempfile.mkdtemp()
    runner = Runner(cfg, None)
    runner.cfg = cfg
    runner.mode = "train"
    runner.exp_dir = cfg.base_exp_dir

    # real signal delivery: the handler must absorb SIGTERM into a flag
    guard = runner._preempt_guard()
    assert not guard.requested
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.requested, "SIGTERM did not reach the guard"

    runner.train()  # exits at the first check point, not a full run
    ckpt_dir = os.path.join(runner.exp_dir, "checkpoints")
    from gens_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    path = latest_checkpoint(ckpt_dir)
    assert path and path.endswith("preempt.ckpt")
    ckpt = load_checkpoint(path)
    assert ckpt["step"] >= 1  # at least one step ran before the save

    # replacement-VM restart: fresh runner, resume=auto finds preempt.ckpt
    guard.__exit__()
    del runner._preempt
    runner2 = Runner(cfg, None)
    runner2.cfg = cfg
    runner2.mode = "train"
    runner2.exp_dir = cfg.base_exp_dir
    runner2.train(resume="auto")
    assert int(runner2.state.step) >= 4  # 2 epochs x 2 scenes completed


def test_emergency_ckpt_excluded_from_auto_resume(runner_setup):
    """Failure-handler checkpoint quarantine: a non-finite loss saves
    emergency.ckpt and aborts, but --resume auto must pick the last GOOD
    checkpoint — resuming the NaN-producing params would re-crash forever."""
    import dataclasses

    import jax.numpy as jnp

    from gens_tpu.train.checkpoint import latest_checkpoint
    from gens_tpu.utils.meters import DictAverageMeter

    cfg, _, _ = runner_setup
    cfg = dataclasses.replace(cfg)
    cfg.train_dataset = dataclasses.replace(
        cfg.train_dataset, dataset_name="synthetic", num_src_view=2,
        img_hw=(64, 64), n_rays=24, scene=("s0", "s1"))
    cfg.train = dataclasses.replace(cfg.train, epochs=1, save_freq=1,
                                    val_freq=100)
    cfg.base_exp_dir = tempfile.mkdtemp()
    runner = Runner(cfg, None)
    runner.cfg = cfg
    runner.mode = "train"
    runner.exp_dir = cfg.base_exp_dir
    runner.train()  # writes the good epoch checkpoint

    ckpt_dir = os.path.join(runner.exp_dir, "checkpoints")
    good = latest_checkpoint(ckpt_dir)
    assert good and "emergency" not in good

    # inject the failure: a NaN loss reaches the metric flush
    with pytest.raises(FloatingPointError):
        runner._flush_metrics([{"loss": jnp.float32(float("nan"))}],
                              DictAverageMeter(), runner.state, epoch=0)
    emergency = os.path.join(ckpt_dir, "emergency.ckpt")
    assert os.path.exists(emergency), "failure handler did not checkpoint"

    # auto-resume resolves to the good checkpoint although emergency.ckpt
    # is strictly newer by mtime
    assert os.path.getmtime(emergency) >= os.path.getmtime(good)
    assert latest_checkpoint(ckpt_dir) == good

    # end-to-end: a fresh runner with --resume auto trains to completion
    cfg2 = dataclasses.replace(cfg)
    cfg2.train = dataclasses.replace(cfg.train, epochs=2)
    runner2 = Runner(cfg2, None)
    runner2.cfg = cfg2
    runner2.mode = "train"
    runner2.exp_dir = cfg.base_exp_dir
    runner2.train(resume="auto")
    assert int(runner2.state.step) == 4  # epoch 2 of 2 completed


def test_train_sharded_one_epoch(runner_setup):
    """Multi-chip Runner.train path on a 2x2 virtual CPU mesh: one epoch of
    the sharded step over synthetic scenes, checkpoint written."""
    import dataclasses
    import jax.numpy as jnp
    from gens_tpu.train.step import init_train_state

    cfg, runner, _ = runner_setup
    cfg = dataclasses.replace(cfg)
    cfg.parallel.data = 2
    cfg.parallel.view = 2
    cfg.train.epochs = 1
    cfg.train.save_freq = 1
    cfg.train.val_freq = 100
    cfg.model.render.perturb = 0.0

    dataset = SyntheticDataset(n_scenes=2, hw=(64, 64), n_rays=32,
                               mode="train")
    state, _ = init_train_state(runner.model, cfg, jax.random.PRNGKey(0),
                                steps_per_epoch=1)
    runner.cfg = cfg
    runner._train_sharded(dataset, state, 0, 2, 2)
    assert int(runner.state.step) == 1
    ckpts = glob.glob(os.path.join(runner.exp_dir, "checkpoints", "*.ckpt"))
    assert ckpts


def test_train_pallas_auto_windows(runner_setup):
    """packed_bilerp="pallas" + splat_window="auto" through the Runner:
    windows are sized to the dataset rig BEFORE tracing (a per-scale list)
    and one epoch trains to a finite loss. NB this exercises the Runner at
    parallel 1x1 (plain jit, no mesh) — on CPU the splat backward resolves
    to the exact jnp bilerp adjoint, NOT the Mosaic kernel (interpret mode
    is not run in the training path; the kernel itself is covered by
    tests/test_pallas_splat.py and the on-device probe). The pallas mode
    under an ACTUAL shard_map is covered by
    tests/test_sharded.py::test_pallas_agg_under_shard_map."""
    import dataclasses

    cfg, _, _ = runner_setup
    cfg = dataclasses.replace(cfg)
    cfg.model = dataclasses.replace(
        cfg.model, volume=dataclasses.replace(
            cfg.model.volume, packed_bilerp="pallas", splat_window="auto"))
    cfg.train_dataset = dataclasses.replace(
        cfg.train_dataset, dataset_name="synthetic", num_src_view=2,
        img_hw=(64, 64), n_rays=16, scene=("s0",))
    cfg.train = dataclasses.replace(cfg.train, epochs=1, save_freq=100,
                                    val_freq=100)
    cfg.base_exp_dir = tempfile.mkdtemp()
    runner = Runner(cfg, None)
    runner.mode = "train"
    runner.train()
    sw = runner.cfg.model.volume.splat_window
    assert isinstance(sw, list) and len(sw) == 5, sw
    assert all(isinstance(w, tuple) and len(w) == 2 for w in sw), sw
    assert int(runner.state.step) == 1


def test_subsample_to_val_grid_matches_dataset_pixels():
    """validate()'s GT-depth subsample must pick the SAME pixels the
    datasets' val ray grid samples (floor(linspace)) — a stride slice
    diverges whenever the stride does not divide the image (VERDICT r03
    weak #8: H=100 at level 8 -> 12 rows; [::8][:12] reads row 88 where
    the ray grid reads row 99)."""
    from gens_tpu.runner import subsample_to_val_grid

    H, W, lvl = 100, 130, 8
    full = np.arange(H * W, dtype=np.float32).reshape(H, W)
    h, w = H // lvl, W // lvl
    # the datasets' val pixel law (data/dtu.py, data/synthetic.py)
    ty = np.linspace(0, H - 1, h).astype(np.int64)
    tx = np.linspace(0, W - 1, w).astype(np.int64)
    expect = full[ty[:, None], tx[None, :]]
    got = subsample_to_val_grid(full, h, w)
    np.testing.assert_array_equal(got, expect)
    # and the old stride slice demonstrably differs on this shape
    old = full[::H // h, ::W // w][:h, :w]
    assert not np.array_equal(old, expect)
