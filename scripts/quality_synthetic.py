"""Quality-evidence run (VERDICT r1 item #1): train the framework to
convergence on the synthetic fixture and record committed artifacts.

Two phases, mirroring the reference's train -> val protocol
(/root/reference/runner.py:117-282) on the analytic stand-in for DTU:

  A. single-scene overfit to convergence: loss/PSNR/Eikonal trajectory +
     mask-cleaned mesh geometric error vs the analytic sphere (the synthetic
     Chamfer: accuracy = mean |  ||v|| - R | over cleaned mesh vertices,
     completeness = camera-visible GT surface samples -> nearest mesh
     vertex, averaged — evaluation/dtu_eval.py:126-142's d2s/s2d).
  B. multi-scene generalization: train on N varied scenes (radius, camera
     ring, light, albedo texture), validate on a HELD-OUT scene — full-image
     PSNR + the same mesh metrics from a one-shot (no finetune) scene build.

Writes QUALITY_r02.json + curve data. Run on the TPU (ambient env):
    python scripts/quality_synthetic.py [--phase all] [--steps-a N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _two_sphere_shape(rng):
    """A random non-convex union of two overlapping spheres (harder geometry
    than the sphere: two lobes, a concave seam, self-occlusion)."""
    r1 = float(0.28 + 0.14 * rng.uniform())
    r2 = float(0.20 + 0.12 * rng.uniform())
    d = (r1 + r2) * float(0.55 + 0.25 * rng.uniform())  # overlapping
    ax = rng.randn(3)
    ax /= np.linalg.norm(ax)
    c1 = -ax * d * r2 / (r1 + r2)
    c2 = ax * d * r1 / (r1 + r2)
    return {"centers": [c1.tolist(), c2.tolist()], "radii": [r1, r2]}


def scene_params(i: int):
    """Deterministic per-scene variation: geometry (sphere or two-sphere
    union), camera ring offset, light, albedo texture, tints. Scene -1 is
    the HELD-OUT sphere validation scene, -2 the HELD-OUT two-sphere scene
    (both inside the training distribution's support, never trained on).
    Odd training scenes are two-sphere unions."""
    if i == -1:
        return dict(radius=0.45, ang0=0.9, light_dir=(0.1, 0.5, -0.85),
                    albedo_freq=7.0, albedo_phase=(0.8, 1.9),
                    tints=(0.9, 0.7, 0.95))
    if i == -2:
        return dict(radius=0.45, ang0=2.2, light_dir=(-0.2, 0.4, -0.85),
                    albedo_freq=8.0, albedo_phase=(2.1, 0.4),
                    tints=(0.95, 0.8, 0.7),
                    shape={"centers": [[-0.18, 0.0, 0.02],
                                       [0.22, 0.05, 0.08]],
                           "radii": [0.36, 0.27]})
    rng = np.random.RandomState(1000 + i)
    out = dict(
        radius=float(0.35 + 0.27 * rng.uniform()),
        ang0=float(rng.uniform(0, 2 * np.pi)),
        light_dir=tuple(
            np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5),
                      -0.85])),
        albedo_freq=float(rng.uniform(4.0, 10.0)),
        albedo_phase=(float(rng.uniform(0, 6)), float(rng.uniform(0, 6))),
        tints=tuple(rng.uniform(0.5, 1.0, 3)),
    )
    if i % 2 == 1:
        out["shape"] = _two_sphere_shape(rng)
    return out


def build_config(n_steps: int, packed: bool = True, dims: int = 64,
                 samples: int = 32, bf16: bool = False, agg: str = "table"):
    from gens_tpu.config import Config

    cfg = Config()
    m = cfg.model
    m.volume.volume_dims = tuple(max(dims >> i, 2) for i in range(5))
    m.render.n_samples = samples
    m.render.n_importance = samples
    m.render.n_sparse_pts = 512
    m.sdf_network.packed_trilerp = packed
    m.color_network.packed_bilerp = packed
    m.volume.packed_bilerp = agg
    if bf16:
        m.volume.dtype = "bfloat16"
        m.reg_network.dtype = "bfloat16"
        m.sdf_network.volume_dtype = "bfloat16"
        m.color_network.packed_dtype = "bfloat16"
    # LR schedule in STEP units (steps_per_epoch=1)
    cfg.train.epochs = n_steps
    cfg.train.warmup = max(n_steps // 20, 1)
    return cfg


def mesh_metrics(verts, tris, scene_kw, raw, label):
    """Mask-cleaned mesh accuracy + visible-surface completeness against the
    analytic shape (sphere or union of spheres, exact closed-form distance).

    Cleaning params are rescaled to the fixture's 128px images: the
    reference's disk(11) dilation is calibrated for 1600x1200 DTU frames
    (clean_mesh.py:113); at 128px it admits a silhouette band wider than the
    sphere's curvature, measured to double the accuracy error."""
    from scipy.spatial import cKDTree

    from gens_tpu.data.synthetic import (shape_distance, shape_spheres,
                                         shape_surface_samples)
    from gens_tpu.mesh.clean import (clean_mesh_by_mask,
                                     clean_mesh_outside_frustum)

    centers, radii = shape_spheres(scene_kw.get("shape"),
                                   scene_kw.get("radius", 0.5))

    out = {}
    if not len(verts):
        return {f"{label}_acc_mean": float("nan")}
    masks = np.asarray(raw["masks"])
    intrs = np.asarray(raw["intrs"])
    c2ws = np.asarray(raw["c2ws"])
    cverts, ctris = clean_mesh_by_mask(
        np.asarray(verts), np.asarray(tris), masks, intrs, c2ws,
        min_nb_visible=1, dilate_radius=2)
    if len(ctris):
        # upscale=None auto-scales the ray grid to out-resolve the faces
        # (otherwise the kept set fragments and min_component wipes it out)
        cverts, ctris = clean_mesh_outside_frustum(
            cverts, ctris, intrs, c2ws, masks.shape[1:3],
            min_component=100)
    out[f"{label}_verts_raw"] = int(len(verts))
    out[f"{label}_verts_clean"] = int(len(cverts))
    if not len(cverts):
        return out
    # DTU-protocol crops before accuracy (dtu_eval.py:104-118): (a) the GT
    # bounding box + margin (drops the NeuS geometric-init unit-sphere
    # remnant, which the reference's meshes also carry and its ObsMask crop
    # removes), (b) the ObsMask analog — only verts OBSERVABLE from >=1
    # camera (in-frustum and on the camera-facing side) are scored, exactly
    # like DTU only scores the observed volume.
    H, W = masks.shape[1:3]
    signed = np.min(np.stack([
        np.linalg.norm(cverts - c, axis=-1) - r
        for c, r in zip(centers, radii)], -1), -1)
    pts = cverts[signed < 0.1]
    out[f"{label}_verts_bbox"] = int(len(pts))
    if not len(pts):
        return out
    # outward direction at each vertex: normal of the NEAREST lobe
    near_k = np.argmin(np.stack([
        np.abs(np.linalg.norm(pts - c, axis=-1) - r)
        for c, r in zip(centers, radii)], -1), -1)
    rdirs = np.zeros_like(pts)
    for k, (c, r) in enumerate(zip(centers, radii)):
        d = pts - c
        d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        rdirs = np.where((near_k == k)[:, None], d, rdirs)
    obs = np.zeros(len(pts), bool)
    for v in range(c2ws.shape[0]):
        cam = c2ws[v][:3, 3]
        facing = np.sum(rdirs * (cam[None] - pts), axis=-1) > 0
        w2c = np.linalg.inv(c2ws[v])
        p_cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = p_cam @ intrs[v].T
        xy = uvw[:, :2] / np.maximum(uvw[:, 2:], 1e-8)
        infr = ((uvw[:, 2] > 0) & (xy[:, 0] >= 0) & (xy[:, 0] < W)
                & (xy[:, 1] >= 0) & (xy[:, 1] < H))
        obs |= facing & infr
    scored = pts[obs] if obs.any() else pts
    out[f"{label}_verts_scored"] = int(obs.sum())
    # accuracy (d2s): scored mesh vertex -> analytic surface
    d2s = shape_distance(scored, centers, radii)
    out[f"{label}_acc_mean"] = float(d2s.mean())
    out[f"{label}_acc_p50"] = float(np.percentile(d2s, 50))
    out[f"{label}_acc_p90"] = float(np.percentile(d2s, 90))
    # uncropped accuracy for transparency (incl. init-sphere remnant)
    d2s_all = shape_distance(cverts, centers, radii)
    out[f"{label}_acc_mean_uncropped"] = float(d2s_all.mean())

    # completeness (s2d): camera-visible GT surface samples -> mesh
    rng = np.random.RandomState(0)
    pts = shape_surface_samples(centers, radii, 20000, rng)
    near_k = np.argmin(np.stack([
        np.abs(np.linalg.norm(pts - c, axis=-1) - r)
        for c, r in zip(centers, radii)], -1), -1)
    dirs = np.zeros_like(pts)
    for k, (c, r) in enumerate(zip(centers, radii)):
        d = pts - c
        d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        dirs = np.where((near_k == k)[:, None], d, dirs)
    vis = np.zeros(len(pts), bool)
    for v in range(raw["c2ws"].shape[0]):
        c2w = np.asarray(raw["c2ws"][v])
        cam = c2w[:3, 3]
        facing = np.sum(dirs * (cam[None] - pts), axis=-1) > 0
        w2c = np.linalg.inv(c2w)
        p_cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = p_cam @ np.asarray(raw["intrs"][v]).T
        xy = uvw[:, :2] / np.maximum(uvw[:, 2:], 1e-8)
        H, W = raw["masks"].shape[1:3]
        infr = ((uvw[:, 2] > 0) & (xy[:, 0] >= 0) & (xy[:, 0] < W)
                & (xy[:, 1] >= 0) & (xy[:, 1] < H))
        vis |= facing & infr
    gt = pts[vis]
    tree = cKDTree(cverts)
    s2d, _ = tree.query(gt, k=1)
    out[f"{label}_comp_mean"] = float(np.mean(s2d))
    out[f"{label}_comp_p90"] = float(np.percentile(s2d, 90))
    out[f"{label}_overall"] = 0.5 * (out[f"{label}_acc_mean"]
                                     + out[f"{label}_comp_mean"])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", default="all",
                   choices=["a", "b", "all", "eval", "ft"])
    p.add_argument("--steps-a", type=int, default=1500)
    p.add_argument("--steps-b", type=int, default=4000)
    p.add_argument("--steps-ft", type=int, default=2000)
    p.add_argument("--n-train-scenes", type=int, default=6)
    # training uses 5 views (1 ref + 4 src) like the reference recipe
    # (confs/gens.conf); evaluation builds the held-out scene from 3 views
    # (the DTU test protocol)
    p.add_argument("--train-views", type=int, default=5)
    p.add_argument("--eval-views", type=int, default=3)
    p.add_argument("--spread", type=float, default=0.5)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--w", type=int, default=0,
                   help="image width when non-square (e.g. 640 with --hw "
                        "480 for the reference's 480x640 frames)")
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--dims", type=int, default=64,
                   help="finest volume-cascade resolution (reference: 256)")
    p.add_argument("--samples", type=int, default=32,
                   help="n_samples = n_importance (reference: 64)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--agg-packed", default="table",
                   choices=["diff", "table", "table_bf16", "pallas"],
                   help="aggregation gradient mode (volume.packed_bilerp); "
                        "table_bf16 = bf16 forward gathers, gradients "
                        "bit-identical to table; pallas = splat-kernel "
                        "backward (windows sized from the synthetic rig)")
    p.add_argument("--resume-from", default="",
                   help="phase b: warm-start params from this checkpoint "
                        "(e.g. the 64^3 round-2 quality_gen.ckpt — all "
                        "networks are resolution-independent)")
    p.add_argument("--mesh-res", type=int, default=192)
    p.add_argument("--agg-remat", default="full",
                   choices=["full", "save_gathers", "save_gathers_proj"],
                   help="volume.agg_remat policy for the train step")
    p.add_argument("--inv-s-ramp", default=None,
                   help="phase b: FORCED NeuS inv_s schedule 's0:s1' — "
                        "projects the variance param up to a log-linear "
                        "ramp each step (see run_training.var_ramp)")
    p.add_argument("--var-lr-mult", type=float, default=1.0,
                   help="NeuS variance-scalar LR multiplier (surface "
                        "sharpening accelerator for short schedules; the "
                        "held-out acc floor tracks ~1/inv_s)")
    p.add_argument("--inflight-every", type=int, default=1000,
                   help="phase b: in-flight checkpoint cadence (steps)")
    p.add_argument("--skip-eval", action="store_true",
                   help="phase b: save the checkpoint and skip the held-out "
                        "evals (for curriculum stages that only feed a "
                        "later stage's --resume-from)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="QUALITY_r03.json")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    import jax.numpy as jnp

    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.mesh.extract import extract_geometry
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.models.renderer import Scene
    from gens_tpu.train.checkpoint import save_checkpoint
    from gens_tpu.train.step import init_train_state, make_train_step

    from gens_tpu.data.synthetic import (shape_spheres, shape_surface_samples,
                                         trace_spheres)

    hw = (args.hw, args.w or args.hw)
    results = {}
    if os.path.exists(args.out):
        # merge-in-place: running a single phase (e.g. a longer --phase b
        # retrain) must not drop the other phases' recorded evidence
        with open(args.out) as f:
            results.update(json.load(f))
    results["config"] = {"hw": list(hw), "rays": args.rays,
                         "mesh_res": args.mesh_res,
                         "samples": args.samples, "bf16": args.bf16,
                         "volume_dims": [max(args.dims >> i, 2)
                                         for i in range(5)],
                         "packed": True}

    def pregen_batches(scene_kw, n_batches, with_pseudo, seed0):
        """Pre-generate ray batches so the train loop never blocks on
        host-side scene synthesis. The per-scene constants (images,
        cameras, near/far) are raytraced + uploaded ONCE and the same
        device buffers shared by every batch — at the reference 480x640
        scale each 5-view image stack is ~18 MB of HBM and re-raytracing
        it per batch dominates pregen time; only the ray sample varies."""
        base = make_scene(n_views=args.train_views, hw=hw, n_rays=args.rays,
                          seed=seed0, spread=args.spread, **scene_kw)
        radius = base["radius"]
        centers, radii = shape_spheres(scene_kw.get("shape"), radius)
        shared = {k: jnp.asarray(base[k])
                  for k in ("imgs", "intrs", "c2ws", "near", "far")}
        H, W = hw
        imgs0 = np.asarray(base["imgs"][0])
        c2w0 = np.asarray(base["c2ws"][0])
        inv_intr_T = np.linalg.inv(np.asarray(base["intrs"][0])).T
        batches = []
        for b in range(n_batches):
            # same sampling law as make_scene's ray batch (uniform pixels
            # of the reference view), deterministic in (seed0, b)
            rng = np.random.RandomState((seed0 + 7919 * b) % (2 ** 31))
            px = rng.randint(0, W, size=args.rays).astype(np.float32)
            py = rng.randint(0, H, size=args.rays).astype(np.float32)
            pix = np.stack([px, py, np.ones_like(px)], -1)
            d = pix @ inv_intr_T
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            rd = (d @ c2w0[:3, :3].T).astype(np.float32)
            ro = np.broadcast_to(c2w0[:3, 3], rd.shape).astype(np.float32)
            inp = dict(shared)
            inp["rays_o"] = jnp.asarray(ro)
            inp["rays_d"] = jnp.asarray(rd)
            inp["color"] = jnp.asarray(imgs0[py.astype(int), px.astype(int)])
            if with_pseudo:
                # exact analytic depth/points stand in for the released
                # pseudo labels (closed-form ray/union-of-spheres hits)
                t, hit, _ = trace_spheres(ro, rd, centers, radii)
                cam_z = (rd @ np.linalg.inv(c2w0[:3, :3]).T)[:, 2]
                inp["pseudo_depth"] = jnp.asarray(
                    np.where(hit, t * cam_z, 0.0).astype(np.float32))
                prng = np.random.RandomState(seed0 + b)
                # over-sample then tile to a FIXED 512 (rejection sampling
                # returns a variable count; batches must share one shape)
                pts = shape_surface_samples(centers, radii, 1200, prng)
                reps = -(-512 // len(pts))
                inp["pseudo_pts"] = jnp.asarray(np.tile(pts, (reps, 1))[:512])
            batches.append(inp)
        return batches, radius

    def run_training(model, cfg, batches, n_steps, tag, init_params=None,
                     inflight_path=None, save_every=1000, var_ramp=None):
        """``init_params``: warm-start params (all networks are
        resolution-independent, so a 64³-trained checkpoint legitimately
        initializes a 128³/256³ run — curriculum, not test leakage: the
        held-out scenes were never trained on at any scale).
        ``inflight_path``: periodic full-state checkpoint; an existing one
        resumes the run at its recorded step (the tunneled chip flakes on
        multi-hour runs; batches are pre-generated so the data stream is
        deterministic in step).
        ``var_ramp``: optional (inv_s0, inv_s1) FORCED NeuS-variance
        schedule — after each step the variance param is projected up to a
        log-linear ramp (several NeuS descendants schedule sharpness
        instead of learning it; at short step counts the learned scalar
        follows the loss gradient DOWN — QUALITY.md r05 sharpen leg). The
        projection is a dispatched device op (no host readback)."""
        from gens_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        state, _ = init_train_state(model, cfg, jax.random.PRNGKey(0),
                                    steps_per_epoch=1)
        if init_params is not None:
            import jax.numpy as _jnp

            state = state._replace(params=jax.tree.map(
                lambda ref, new: _jnp.asarray(new, ref.dtype),
                state.params, init_params))
        start_step = 0
        if inflight_path and os.path.exists(inflight_path):
            payload = load_checkpoint(
                inflight_path, target={"step": 0, "params": state.params,
                                       "opt_state": state.opt_state})
            state = state._replace(
                params=payload["params"], opt_state=payload["opt_state"],
                step=jnp.asarray(payload["step"], jnp.int32))
            start_step = int(payload["step"])
            print(f"[{tag}] resumed in-flight at step {start_step}",
                  flush=True)
        _, step_fn = make_train_step(model, cfg, steps_per_epoch=1)
        curve = []
        if start_step >= n_steps:
            # an in-flight checkpoint at/past the target: nothing to train
            # (re-invoking with a lower --steps-b cuts a run short and
            # proceeds straight to the evals)
            print(f"[{tag}] in-flight step {start_step} >= {n_steps}: "
                  f"skipping training", flush=True)
            return state, curve, 0.0, 0.0
        t0 = time.time()
        t_compile = None
        step = start_step
        for step in range(start_step, n_steps):
            inputs = batches[step % len(batches)]
            anneal = min(1.0, step / max(cfg.train.anneal_end, 1))
            try:
                state, metrics = step_fn(state, inputs,
                                         jax.random.PRNGKey(step),
                                         anneal, use_match_features=False)
            except jax.errors.JaxRuntimeError as e:
                # the tunneled remote-compile service flakes transiently;
                # one retry re-dispatches against the warm cache
                print(f"[{tag}] step {step}: transient backend error, "
                      f"retrying once: {e}", flush=True)
                time.sleep(5.0)
                state, metrics = step_fn(state, inputs,
                                         jax.random.PRNGKey(step),
                                         anneal, use_match_features=False)
            if var_ramp is not None:
                import math

                frac = (step + 1) / max(n_steps, 1)
                inv_s_floor = var_ramp[0] * (var_ramp[1] / var_ramp[0]) ** frac
                v_floor = math.log(inv_s_floor) / 10.0
                state = state._replace(params={
                    **state.params,
                    "variance": jax.tree.map(
                        lambda v: jnp.maximum(v, v_floor),
                        state.params["variance"])})
            if step == start_step:
                jax.block_until_ready(metrics["loss"])
                t_compile = time.time() - t0
                t0 = time.time()
            if (inflight_path and save_every
                    and (step + 1) % save_every == 0):
                save_checkpoint(inflight_path,
                                {"step": step + 1, "params": state.params,
                                 "opt_state": state.opt_state})
            if step % 25 == 0 or step == n_steps - 1:
                scal = {k: float(metrics[k]) for k in
                        ("loss", "psnr", "eikonal_loss", "color_loss",
                         "mfc_loss", "sparse_loss")}
                scal["step"] = step
                curve.append(scal)
                print(f"[{tag}] step {step}: loss {scal['loss']:.4f} "
                      f"psnr {scal['psnr']:.2f} eik "
                      f"{scal['eikonal_loss']:.4f} "
                      f"[{time.time() - t0:.0f}s]", flush=True)
        jax.block_until_ready(metrics["loss"])
        dt = time.time() - t0
        ms_per_step = dt / max(step - start_step, 1) * 1e3
        print(f"[{tag}] {n_steps} steps, compile {t_compile:.0f}s, "
              f"{ms_per_step:.0f} ms/step", flush=True)
        return state, curve, ms_per_step, t_compile

    def eval_scene(model, params, scene_kw, tag, radius=None):
        """Held-out/eval protocol: one-shot scene build, full-image render,
        mesh extraction + mask cleaning + geometric error."""
        del radius  # geometry comes from scene_kw (shape-aware metrics)
        raw_train = make_scene(n_views=args.eval_views, hw=hw, n_rays=16,
                               seed=123, spread=args.spread, **scene_kw)
        inputs = {k: jnp.asarray(v) for k, v in raw_train.items()
                  if k not in ("radius", "view_masks")}
        build = jax.jit(lambda p, i: model.build_scene(
            p, i["imgs"], i["intrs"], i["c2ws"]))
        scene = build(params, inputs)

        # full-image render at stride 2
        stride = 2
        H, W = hw
        ys, xs = np.meshgrid(np.arange(0, H, stride),
                             np.arange(0, W, stride), indexing="ij")
        pix = np.stack([xs.ravel(), ys.ravel(),
                        np.ones(xs.size)], -1).astype(np.float32)
        intr = raw_train["intrs"][0]
        c2w = raw_train["c2ws"][0]
        d = pix @ np.linalg.inv(intr).T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays_d = (d @ c2w[:3, :3].T).astype(np.float32)
        rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).astype(np.float32)
        gt = raw_train["imgs"][0][ys.ravel(), xs.ravel()]

        chunk = 1024
        npad = (-len(rays_o)) % chunk
        ro = np.concatenate([rays_o, rays_o[-1:].repeat(npad, 0)])
        rd = np.concatenate([rays_d, rays_d[-1:].repeat(npad, 0)])
        render = jax.jit(lambda p, s, a, b: model.renderer.render(
            p, a, b, inputs["near"], inputs["far"], s,
            cos_anneal_ratio=1.0, use_match_features=False, key=None,
            train=False))
        cols = []
        for i in range(0, len(ro), chunk):
            out = render(params, scene, jnp.asarray(ro[i:i + chunk]),
                         jnp.asarray(rd[i:i + chunk]))
            cols.append(np.asarray(out["color_fine"]))
        color = np.concatenate(cols)[:len(rays_o)]
        mse = float(((color - gt) ** 2).mean())
        psnr = 20.0 * np.log10(1.0 / np.sqrt(mse + 1e-12))

        # Pallas fused kernel on TPU, jnp elsewhere — the compiled kernel is
        # bit-exact vs the jnp path on-device (scripts/validate_pallas.py,
        # PALLAS_PARITY.json: max_abs_diff 0.0 over 262k points)
        sdf_fn = model.renderer.sdf_fn_for_extraction(params, scene.volumes)
        verts, tris = extract_geometry(sdf_fn, [-1] * 3, [1] * 3,
                                       resolution=args.mesh_res, block=64)
        # masks for cleaning come from the analytic hit masks
        raw_eval = {"masks": raw_train["view_masks"],
                    "intrs": raw_train["intrs"], "c2ws": raw_train["c2ws"]}
        m = mesh_metrics(verts, tris, scene_kw, raw_eval, tag)
        m[f"{tag}_psnr"] = float(psnr)
        return m

    def flush():
        """Incremental artifact write (a later-phase crash must not lose an
        earlier phase's evidence)."""
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    def build_cfg(n_steps):
        """build_config + (for the pallas splat backward) window sizing from
        the synthetic rig — the same probe-and-margin policy as
        Runner._auto_splat_windows, over a sample of fixture scenes."""
        cfg = build_config(n_steps, dims=args.dims, samples=args.samples,
                           bf16=args.bf16, agg=args.agg_packed)
        cfg.model.volume.agg_remat = args.agg_remat
        cfg.train.lr_variance_mult = args.var_lr_mult
        if args.agg_packed == "pallas":
            from gens_tpu.ops.pallas_splat import required_windows_cascade
            wins = None
            for i in (0, 1, 2, -1, -2):
                raw = make_scene(n_views=args.train_views, hw=hw, n_rays=8,
                                 seed=0, spread=args.spread,
                                 **scene_params(i))
                w = required_windows_cascade(
                    np.asarray(raw["intrs"]), np.asarray(raw["c2ws"]),
                    cfg.model.volume.volume_dims, hw)
                wins = (w if wins is None else
                        [(max(a[0], b[0]), max(a[1], b[1]))
                         for a, b in zip(wins, w)])
            cfg.model.volume.splat_window = [
                (int(u * 1.25) + 1, int(v * 1.25) + 1) for u, v in wins]
            print("pallas splat windows:", cfg.model.volume.splat_window,
                  flush=True)
            # the probe covers a SAMPLE of scenes; verify the sized windows
            # against EVERY scene this run will actually touch (the Runner
            # does the same per-scene at data-load time — r04 guard)
            from gens_tpu.ops.pallas_splat import assert_window_covers
            for i in list(range(args.n_train_scenes)) + [-1, -2]:
                raw = make_scene(n_views=args.train_views, hw=hw, n_rays=8,
                                 seed=0, spread=args.spread,
                                 **scene_params(i))
                assert_window_covers(cfg.model.volume.splat_window,
                                     cfg.model.volume.volume_dims,
                                     np.asarray(raw["intrs"]),
                                     np.asarray(raw["c2ws"]), hw)
        return cfg

    model = None
    if args.phase in ("a", "all"):
        cfg = build_cfg(args.steps_a)
        cfg.train.anneal_end = args.steps_a // 4
        model = GenSModel(cfg.model)
        kw = {k: v for k, v in scene_params(0).items()}
        batches, radius = pregen_batches(kw, 64, with_pseudo=False, seed0=0)
        state, curve, msps, tc = run_training(model, cfg, batches,
                                              args.steps_a, "overfit")
        results["overfit_curve"] = curve
        results["overfit_ms_per_step"] = msps
        results["overfit_compile_s"] = tc
        results["overfit_psnr_first"] = curve[0]["psnr"]
        results["overfit_psnr_last"] = curve[-1]["psnr"]
        results.update(eval_scene(model, state.params, kw, "overfit",
                                  radius))
        save_checkpoint("runs/quality_overfit.ckpt",
                        {"epoch": 0, "step": args.steps_a,
                         "params": state.params})
        flush()
        print(json.dumps({k: v for k, v in results.items()
                          if not k.endswith("curve")}, indent=1), flush=True)

    if args.phase in ("b", "all"):
        cfg = build_cfg(args.steps_b)
        cfg.train.anneal_end = args.steps_b // 8
        cfg.train.loss.pseudo_sdf_weight = 1.0
        cfg.train.loss.pseudo_depth_weight = 0.05
        model = GenSModel(cfg.model)
        all_batches = []
        for i in range(args.n_train_scenes):
            kw = scene_params(i)
            per_scene = max(args.steps_b // args.n_train_scenes // 4, 8)
            b, _ = pregen_batches(kw, per_scene, with_pseudo=True,
                                  seed0=10000 * (i + 1))
            all_batches.append(b)
        # interleave scenes round-robin
        batches = []
        for j in range(max(len(b) for b in all_batches)):
            for b in all_batches:
                batches.append(b[j % len(b)])
        init_params = None
        if args.resume_from:
            from gens_tpu.train.checkpoint import load_checkpoint

            ref_params = model.init_params(
                jax.random.PRNGKey(0),
                n_src_views=cfg.train_dataset.num_src_view)
            ck = load_checkpoint(args.resume_from,
                                 target={"epoch": 0, "step": 0,
                                         "params": ref_params})
            init_params = ck["params"]
            print(f"warm start from {args.resume_from} "
                  f"(step {ck.get('step')})", flush=True)
        ramp = (tuple(float(x) for x in args.inv_s_ramp.split(":"))
                if args.inv_s_ramp else None)
        state, curve, msps, tc = run_training(
            model, cfg, batches, args.steps_b, "gen",
            init_params=init_params,
            inflight_path=f"runs/quality_gen_inflight_{args.dims}.ckpt",
            save_every=args.inflight_every, var_ramp=ramp)
        results["gen_curve"] = curve
        results["gen_ms_per_step"] = msps
        results["gen_compile_s"] = tc
        # checkpoint BEFORE the evals so an eval crash cannot lose the run.
        # Record the ACTUAL trained step (state.step), not args.steps_b —
        # the early-return resume path can hand back params trained past
        # the target, and this payload is consumed cross-round as a warm
        # start (ADVICE r04)
        save_checkpoint("runs/quality_gen.ckpt",
                        {"epoch": 0, "step": int(state.step),
                         "params": state.params})
        flush()
        if not args.skip_eval:
            kw_held = scene_params(-1)
            results.update(eval_scene(model, state.params, kw_held,
                                      "heldout"))
            flush()
            # the HELD-OUT two-sphere scene: non-convex geometry never
            # trained on
            kw_held2 = scene_params(-2)
            results.update(eval_scene(model, state.params, kw_held2,
                                      "heldout_union"))
            flush()
            # also score one TRAINED scene for the train/val gap
            kw0 = scene_params(0)
            results.update(eval_scene(model, state.params, kw0, "trained"))

    if args.phase == "ft":
        # Per-scene finetune regime quality (the reference's third run mode,
        # runner.py:284-377): load the generalizable checkpoint, one-shot
        # init_volumes on the held-out scene's eval views, optimize
        # {volumes + implicit-surface MLP} with the finetune loss overrides
        # (confs/gens_finetune.conf: sparse 0, smooth 5e-4), and score the
        # mesh before/after. Evidence that finetuning IMPROVES geometry,
        # mirroring the reference's direct-inference -> finetuned DTU gain.
        import optax

        from gens_tpu.losses import compute_losses
        from gens_tpu.train.checkpoint import load_checkpoint
        from gens_tpu.train.step import make_finetune_optimizer

        ckpt = load_checkpoint("runs/quality_gen.ckpt")
        params = ckpt["params"]
        cfg = build_cfg(args.steps_ft)
        cfg.train.anneal_end = max(args.steps_ft // 8, 1)
        cfg.train.warmup = 0
        cfg.train.loss.sparse_weight = 0.0
        cfg.train.loss.smooth_weight = 5e-4
        cfg.train.loss.pseudo_depth_weight = 0.0
        model = GenSModel(cfg.model)
        kw = scene_params(-1)
        radius = kw["radius"]
        n_views = args.eval_views

        base = make_scene(n_views=n_views, hw=hw, n_rays=args.rays,
                          seed=123, spread=args.spread, **kw)
        init_inputs = {k: jnp.asarray(base[k])
                       for k in ("imgs", "intrs", "c2ws")}
        volumes, mask_vols, features = jax.jit(
            lambda p, i: model.init_volumes(
                p, i["imgs"], i["intrs"], i["c2ws"]))(params, init_inputs)
        ft_params = {"volumes": list(volumes), "sdf": params["sdf"],
                     "blending": params["blending"],
                     "variance": params["variance"]}
        static = {"mask_volumes": list(mask_vols),
                  "features": list(features)}
        optimizer = make_finetune_optimizer(cfg.train)
        opt_state = optimizer.init(ft_params)

        # direct-inference baseline from the SAME one-shot volumes (what the
        # finetune must beat)
        def ft_mesh_metrics(vols, tag):
            mlp = {k: ft_params[k] for k in ("sdf", "blending", "variance")}
            sdf_fn = model.renderer.sdf_fn_for_extraction(mlp, list(vols))
            verts, tris = extract_geometry(sdf_fn, [-1] * 3, [1] * 3,
                                           resolution=args.mesh_res,
                                           block=64)
            raw_eval = {"masks": base["view_masks"], "intrs": base["intrs"],
                        "c2ws": base["c2ws"]}
            return mesh_metrics(verts, tris, kw, raw_eval, tag)

        results.update(ft_mesh_metrics(ft_params["volumes"], "ft_init"))
        flush()

        # per-step ray resampling over a permuted view (reference
        # runner.py:296, dtu_finetune.py:258-294), pre-generated host-side
        H, W = hw
        prng = np.random.RandomState(7)
        intr_inv = np.linalg.inv(base["intrs"][0])
        dist = float(np.linalg.norm(base["c2ws"][0][:3, 3]))
        near = np.full((1, 1), 0.95 * (dist - 1.0), np.float32)
        far = np.full((1, 1), 1.05 * (dist + 1.0), np.float32)
        n_batches = 64

        def ft_batch(b):
            vid = b % n_views
            order = np.roll(np.arange(n_views), -vid)
            px = prng.randint(0, W, args.rays).astype(np.float32)
            py = prng.randint(0, H, args.rays).astype(np.float32)
            pix = np.stack([px, py, np.ones_like(px)], -1)
            d = pix @ intr_inv.T
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            c2w = base["c2ws"][vid]
            rays_d = (d @ c2w[:3, :3].T).astype(np.float32)
            rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
            color = base["imgs"][vid][py.astype(int), px.astype(int)]
            cc, rr = shape_spheres(kw.get("shape"), radius)
            spts = shape_surface_samples(cc, rr, 1200, prng)
            spts = np.tile(spts, (-(-512 // len(spts)), 1))[:512]
            return {k: jnp.asarray(v) for k, v in dict(
                imgs=base["imgs"][order], intrs=base["intrs"][order],
                c2ws=base["c2ws"][order], view_ids=order.astype(np.int32),
                rays_o=np.ascontiguousarray(rays_o), rays_d=rays_d,
                color=color.astype(np.float32), near=near, far=far,
                pseudo_pts=spts).items()}

        batches = [ft_batch(b) for b in range(n_batches)]

        @jax.jit
        def ft_step(ftp, opt_state, inputs, key, anneal):
            def loss_fn(p):
                out = model.forward_finetune(p, static, inputs, anneal, key)
                losses = compute_losses(out, inputs, cfg.train.loss)
                mse = jnp.mean((out["color_fine"] - inputs["color"]) ** 2)
                losses["psnr"] = 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))
                return losses["loss"], losses

            grads, metrics = jax.grad(loss_fn, has_aux=True)(ftp)
            updates, opt_state = optimizer.update(grads, opt_state, ftp)
            return optax.apply_updates(ftp, updates), opt_state, metrics

        curve = []
        t0 = time.time()
        t_compile = None
        for step in range(args.steps_ft):
            anneal = min(1.0, step / max(cfg.train.anneal_end, 1))
            ft_params, opt_state, metrics = ft_step(
                ft_params, opt_state, batches[step % n_batches],
                jax.random.PRNGKey(step), anneal)
            if step == 0:
                jax.block_until_ready(metrics["loss"])
                t_compile = time.time() - t0
                t0 = time.time()
            if step % 100 == 0 or step == args.steps_ft - 1:
                scal = {k: float(metrics[k])
                        for k in ("loss", "psnr", "eikonal_loss",
                                  "color_loss")}
                scal["step"] = step
                curve.append(scal)
                print(f"[ft] step {step}: loss {scal['loss']:.4f} "
                      f"psnr {scal['psnr']:.2f} [{time.time() - t0:.0f}s]",
                      flush=True)
        jax.block_until_ready(metrics["loss"])
        results["ft_curve"] = curve
        results["ft_ms_per_step"] = (time.time() - t0) * 1e3 / max(
            args.steps_ft - 1, 1)
        results["ft_compile_s"] = t_compile
        results.update(ft_mesh_metrics(ft_params["volumes"], "ft"))
        save_checkpoint("runs/quality_ft.ckpt",
                        {"epoch": 0, "step": args.steps_ft,
                         "params": {**{k: ft_params[k] for k in
                                       ("sdf", "blending", "variance")},
                                    "volumes": ft_params["volumes"],
                                    "mask_volumes": static["mask_volumes"],
                                    "features": static["features"]}})
        flush()

    if args.phase == "eval":
        # re-score saved checkpoints (e.g. after a metric-protocol change)
        # without retraining; merges into an existing artifact when present
        from gens_tpu.train.checkpoint import load_checkpoint

        if os.path.exists("runs/quality_overfit.ckpt"):
            ckpt = load_checkpoint("runs/quality_overfit.ckpt")
            cfg = build_cfg(args.steps_a)
            model = GenSModel(cfg.model)
            kw = scene_params(0)
            results.update(eval_scene(model, ckpt["params"], kw, "overfit"))
            flush()
        if os.path.exists("runs/quality_gen.ckpt"):
            ckpt = load_checkpoint("runs/quality_gen.ckpt")
            cfg = build_cfg(args.steps_b)
            model = GenSModel(cfg.model)
            kw_held = scene_params(-1)
            results.update(eval_scene(model, ckpt["params"], kw_held,
                                      "heldout"))
            results.update(eval_scene(model, ckpt["params"],
                                      scene_params(-2), "heldout_union"))
            kw0 = scene_params(0)
            results.update(eval_scene(model, ckpt["params"], kw0, "trained"))
            flush()

    flush()
    print("wrote", args.out, flush=True)
    summary = {k: v for k, v in results.items() if not k.endswith("curve")}
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
