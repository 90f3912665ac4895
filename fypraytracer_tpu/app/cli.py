"""Headless CLI — the framework's app surface.

Replaces the reference's interactive Walnut/ImGui app (WalnutApp.cpp) with
three commands mirroring its workflows (SURVEY.md §7 step 9):

  render     one technique, fixed frame count or time budget, image +
             provenance filename (WalnutApp.cpp:780-910 offline mode)
  benchmark  all (or selected) techniques at equal time/frames, MSE/PSNR
             against a golden image or a long-run self-reference
             (the "Benchmark render results" button, WalnutApp.cpp:590-615)
  train      inverse rendering: fit material parameters to a target image
             (new capability; SURVEY.md §7 step 7)

Usage::

    python -m fypraytracer_tpu.app.cli render --scene cornell --technique
        nee --width 256 --height 256 --frames 64 -o out/
    python -m fypraytracer_tpu.app.cli benchmark --scene cornell --seconds 10
    python -m fypraytracer_tpu.app.cli train --scene cornell --steps 50
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique

_TECH = {
    "brute": SamplingTechnique.BRUTE_FORCE,
    "uniform": SamplingTechnique.UNIFORM,
    "cosine": SamplingTechnique.COSINE,
    "ggx": SamplingTechnique.GGX,
    "brdf": SamplingTechnique.BRDF,
    "light": SamplingTechnique.LIGHT_SOURCE,
    "nee": SamplingTechnique.NEE_MIS,
    "restir-di": SamplingTechnique.RESTIR_DI,
    "restir-gi": SamplingTechnique.RESTIR_GI,
}


def _load_scene(args):
    from fypraytracer_tpu.scene.sceneio import builtin_scene, load_scene_file

    if args.scene.endswith(".json"):
        builder, cam = load_scene_file(args.scene)
    else:
        builder, cam = builtin_scene(args.scene, args.width, args.height)
    cam.resize(args.width, args.height)
    return builder.compile(), cam


def _settings(args, technique) -> RenderSettings:
    return RenderSettings(
        technique=technique, bounces=args.bounces, samples=args.samples,
        sky_color=tuple(args.sky), light_candidates=args.candidates,
        spatial_neighbors=args.neighbors, spatial_radius=args.radius,
        temporal_history_limit=args.history)


def _burst_run(mk, frames, burst, reps, idle):
    """Burst-window timing protocol (VERDICT r3 #2): the runtime meters
    device-busy time with a token bucket (~63 ms full-rate credit per
    idle period, sustained ~1/6.9 of burst — PERF.md #26), so long
    dispatches report ~6.9x-dilated per-frame times.  TRUE kernel speed
    is measured with SHORT dispatches (``burst`` frames) separated by
    idle sleeps that refill the credit; the reported number is the
    fastest rep net of per-call host overhead (measured by re-fencing a
    resident array).  Accumulates ``frames`` total so image quality is
    still comparable.  Returns (avg_hdr, frames_done, burst_ms/frame).
    """
    import jax

    fence = jax.jit(lambda v: v.ravel()[0])
    avg = mk.render_many(burst)                 # compile + warm
    float(fence(avg))
    done = burst
    best = float("inf")
    while done < max(frames, burst * (reps + 1)):
        time.sleep(idle)
        t0 = time.perf_counter()
        avg = mk.render_many(burst)
        float(fence(avg))
        wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fence(avg))                       # no new work: host overhead
        host = time.perf_counter() - t0
        best = min(best, max(wall - host, 1e-9))
        done += burst
    return np.asarray(avg), done, best / burst * 1000.0


def _make_megakernel_renderer(scene, cam, settings, gi_fast=None):
    import jax

    # off-TPU the Pallas kernels run through the interpreter — slow but
    # correct, so the CLI fast paths work on CPU-only machines too
    interpret = jax.default_backend() == "cpu"
    tech = int(settings.technique)
    if tech == 7:      # RESTIR_DI
        from fypraytracer_tpu.render.megakernel_restir import (
            MegakernelReSTIRDI)
        return MegakernelReSTIRDI(scene, cam, settings, interpret=interpret)
    if tech == 8:      # RESTIR_GI
        from fypraytracer_tpu.render.megakernel_restir_gi import (
            MegakernelReSTIRGI)
        # default (gi_fast=None -> final_vis=False unless env overrides):
        # the reference's per-neighbor visibility (Renderer.cu:2356-2366);
        # --gi-fast opts into the single winner-visibility sweep (~1.7x)
        return MegakernelReSTIRGI(scene, cam, settings, interpret=interpret,
                                  final_vis=(True if gi_fast else None))
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    return MegakernelRenderer(scene, cam, settings, interpret=interpret)


def _render_run(scene, cam, settings, frames=None, seconds=None, impl="auto",
                strict=False, burst=0, burst_reps=4, burst_idle=2.5,
                gi_fast=None):
    """Accumulate frames; returns (avg_hdr, frames, avg_frame_ms, impl_used).

    ``impl``: 'auto' | 'wavefront' | 'megakernel' — megakernel is the fast
    fused path (render/megakernel.py for the hemisphere family + NEE,
    render/megakernel_restir{,_gi}.py for ReSTIR DI/GI) and requires a
    frame budget (``frames``).  A megakernel failure falls back to the
    wavefront renderer with a logged warning; pass ``strict=True`` (or
    request impl='megakernel' explicitly) to error instead, so a fast-path
    regression can't silently re-route benchmarks to the ~40x slower path.

    ``burst`` > 0 switches the timing to the burst-window protocol
    (``_burst_run``): ``burst``-frame dispatches with ``burst_idle``-second
    credit-refill sleeps; the reported ms/frame is true kernel speed, not
    the sustained (throttled) rate.
    """
    from fypraytracer_tpu.render.renderer import Renderer

    tech = int(settings.technique)
    use_mk = impl == "megakernel" or (
        impl == "auto" and frames is not None and (frames >= 16 or burst)
        and tech in (0, 1, 2, 3, 4, 5, 6, 7, 8)
        and (cam.width * cam.height) % 128 == 0)
    if burst and not use_mk:
        # the burst protocol is a megakernel measurement; silently timing
        # the wavefront path instead would report throttled non-burst
        # numbers under a burst label (ADVICE r4)
        raise SystemExit(
            "--burst requires the megakernel path (resolution divisible "
            f"by 128, --frames set); got {cam.width}x{cam.height}, "
            f"impl={impl}")
    if use_mk:
        try:
            mk = _make_megakernel_renderer(scene, cam, settings,
                                           gi_fast=gi_fast)
            if burst:
                avg, n, ms = _burst_run(mk, frames or 0, burst, burst_reps,
                                        burst_idle)
                return avg, n, ms, "megakernel-burst"
            np.asarray(mk.render_many(frames))  # batch 1: compile + frames
            t0 = time.perf_counter()
            avg = np.asarray(mk.render_many(frames))  # batch 2: timed
            dt = time.perf_counter() - t0
            return avg, 2 * frames, dt / frames * 1000.0, "megakernel"
        except Exception as exc:
            if strict or impl == "megakernel" or burst:
                raise
            import traceback
            print(json.dumps({"warning": "megakernel failed; falling back "
                              "to wavefront renderer",
                              "error": f"{type(exc).__name__}: {exc}"}))
            traceback.print_exc()

    r = Renderer(scene, cam, settings)
    avg = r.render_hdr()
    np.asarray(avg)  # exclude compile from timing (forces completion)
    r.reset()

    t0 = time.perf_counter()
    n = 0
    while True:
        avg = r.render_hdr()
        n += 1
        if frames is not None and n >= frames:
            break
        if seconds is not None and time.perf_counter() - t0 >= seconds:
            break
    avg = np.asarray(avg)
    dt = time.perf_counter() - t0
    return avg, n, dt / n * 1000.0, "wavefront"


def _render_checkpointed(scene, cam, settings, frames, ckpt_dir, every,
                         impl="auto", gi_fast=None):
    """Long-offline-render path: accumulate ``frames`` in ``every``-frame
    batches, checkpointing after each (utils/checkpoint.py — accumulation
    + frame index + ReSTIR reservoir state), resuming from ``ckpt_dir``
    if it already holds a checkpoint.  The reference's 120-min offline
    renders (WalnutApp.cpp:23,901-905) lose everything on a crash; here
    `cli render --checkpoint-dir D` survives restarts exactly."""
    from fypraytracer_tpu.render.renderer import Renderer
    from fypraytracer_tpu.utils.checkpoint import (load_checkpoint,
                                                   save_checkpoint)

    resumed = os.path.exists(os.path.join(ckpt_dir, "meta.json"))
    use_mk = impl != "wavefront" and (cam.width * cam.height) % 128 == 0
    if impl == "megakernel" and not use_mk:
        raise SystemExit(
            "--impl megakernel requires width*height divisible by 128; "
            f"got {cam.width}x{cam.height}")
    if resumed:
        # the checkpoint records which renderer wrote it (and, for GI,
        # which visibility estimator) — resume into exactly that, never
        # into whatever today's flags would pick
        meta = json.load(open(os.path.join(ckpt_dir, "meta.json")))
        saved = meta.get("renderer", {})
        use_mk = saved.get("class", "Renderer") != "Renderer"
        saved_fv = saved.get("final_vis")
        if saved_fv is not None:
            gi_fast = bool(saved_fv)

    if use_mk:
        def factory(s, c, st):
            return _make_megakernel_renderer(s, c, st, gi_fast=gi_fast)
    else:
        factory = Renderer

    if resumed:
        r = load_checkpoint(ckpt_dir, scene, renderer_cls=factory)
    else:
        r = factory(scene, cam, settings)
    done0 = r.frame_index - 1
    print(json.dumps({"checkpoint": ckpt_dir, "resumed": resumed,
                      "frames_done": done0}))

    t0 = time.perf_counter()
    avg = None
    while r.frame_index - 1 < frames:
        n = min(every, frames - (r.frame_index - 1))
        if use_mk:
            avg = np.asarray(r.render_many(n))
        else:
            for _ in range(n):
                avg = r.render_hdr()
            avg = np.asarray(avg)
        save_checkpoint(ckpt_dir, r)
        print(json.dumps({"frames_done": r.frame_index - 1,
                          "checkpointed": True}))
    if avg is None:   # already complete on resume
        if use_mk:
            from fypraytracer_tpu.render.megakernel import _finish_avg
            import jax.numpy as jnp

            avg = np.asarray(_finish_avg(
                r.accum, jnp.float32(max(r.frame_index - 1, 1))))
            avg = avg.reshape(cam.height, cam.width, 3)
        else:
            avg = np.asarray(r.accum / max(r.frame_index - 1, 1))
    n_new = (r.frame_index - 1) - done0
    dt = time.perf_counter() - t0
    ms = dt / max(n_new, 1) * 1000.0
    return avg, r.frame_index - 1, ms, \
        ("megakernel" if use_mk else "wavefront") + "-ckpt"


def _save(outdir, name, hdr, settings, avg_ms, minutes, golden=None):
    from fypraytracer_tpu.core.color import finalize_pixels, to_uint8_rgb
    from fypraytracer_tpu.utils import metrics
    from fypraytracer_tpu.utils.image import load_bmp, save_bmp, save_png
    from fypraytracer_tpu.utils.provenance import run_name, write_sidecar

    rgb8 = to_uint8_rgb(finalize_pixels(hdr, np.float32(1.0)))
    mse = psnr = None
    if golden:
        ref = load_bmp(golden) if golden.endswith(".bmp") else None
        if ref is None:
            raise SystemExit("golden must be a .bmp (MisUtils protocol)")
        mse = metrics.mse_8bit(rgb8, ref)
        psnr = metrics.psnr(mse)
    base = run_name(settings, avg_frame_ms=avg_ms, total_minutes=minutes,
                    mse=mse, psnr=psnr)
    os.makedirs(outdir, exist_ok=True)
    save_bmp(os.path.join(outdir, base + ".bmp"), rgb8)
    save_png(os.path.join(outdir, base + ".png"), rgb8)
    write_sidecar(os.path.join(outdir, base + ".json"), settings,
                  avg_frame_ms=avg_ms, total_minutes=minutes, mse=mse,
                  psnr=psnr)
    return base, mse, psnr


def cmd_render(args):
    scene, cam = _load_scene(args)
    settings = _settings(args, _TECH[args.technique])
    if args.checkpoint_dir:
        if args.frames is None:
            raise SystemExit("--checkpoint-dir requires --frames")
        hdr, n, avg_ms, impl = _render_checkpointed(
            scene, cam, settings, args.frames, args.checkpoint_dir,
            args.checkpoint_every, impl=args.impl, gi_fast=args.gi_fast)
    else:
        hdr, n, avg_ms, impl = _render_run(scene, cam, settings,
                                           frames=args.frames,
                                           seconds=args.seconds,
                                           impl=args.impl,
                                           strict=args.strict,
                                           gi_fast=args.gi_fast)
    base, mse, psnr = _save(args.out, args.technique, hdr, settings, avg_ms,
                            n * avg_ms / 60000.0, args.golden)
    print(json.dumps({"output": base, "frames": n,
                      "avg_frame_ms": round(avg_ms, 2), "impl": impl,
                      "mse": mse, "psnr": psnr}))


def cmd_benchmark(args):
    """Equal-budget comparison across techniques (the reference's whole
    purpose, README.md:5-7)."""
    if args.burst and args.frames is None:
        # the burst protocol dispatches fixed frame batches; a seconds
        # budget would silently fall through to the wavefront path and
        # report throttled timings as if the protocol ran
        raise SystemExit("--burst requires --frames (not --seconds)")
    scene, cam = _load_scene(args)
    techniques = (args.techniques.split(",") if args.techniques
                  else ["uniform", "cosine", "ggx", "brdf", "light", "nee",
                        "restir-di", "restir-gi"])

    # golden: long accumulation of the lowest-variance estimator
    # (convergence oracle, SURVEY §4.4; the reference's implicit oracle is
    # a long-run render, README.md:31) — default 256 frames of NEE+MIS
    from fypraytracer_tpu.core.color import finalize_pixels, to_uint8_rgb
    from fypraytracer_tpu.utils import metrics as M

    golden8 = None
    if args.golden_frames > 0:
        golden_hdr, _, _, _ = _render_run(
            scene, cam, _settings(args, _TECH[args.golden_technique]).replace(
                samples=max(args.samples, 4)),
            frames=args.golden_frames, strict=args.strict)
        golden8 = to_uint8_rgb(finalize_pixels(golden_hdr, np.float32(1.0)))
        if args.out:
            from fypraytracer_tpu.utils.image import save_png
            os.makedirs(args.out, exist_ok=True)
            save_png(os.path.join(args.out, "golden.png"), golden8)

    rows = []
    for name in techniques:
        settings = _settings(args, _TECH[name])
        hdr, n, avg_ms, impl = _render_run(scene, cam, settings,
                                           frames=args.frames,
                                           seconds=args.seconds,
                                           strict=args.strict,
                                           burst=args.burst,
                                           burst_reps=args.burst_reps,
                                           burst_idle=args.burst_idle,
                                           gi_fast=args.gi_fast)
        rgb8 = to_uint8_rgb(finalize_pixels(hdr, np.float32(1.0)))
        row = {"technique": name, "frames": n,
               "avg_frame_ms": round(avg_ms, 2), "impl": impl}
        if golden8 is not None:
            mse = M.mse_8bit(rgb8, golden8)
            row.update(mse=round(mse, 4), psnr=round(M.psnr(mse), 2))
        rows.append(row)
        print(json.dumps(rows[-1]))
        if args.out:
            from fypraytracer_tpu.utils.image import save_png
            os.makedirs(args.out, exist_ok=True)
            save_png(os.path.join(args.out, name + ".png"), rgb8)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "benchmark.json"), "w") as f:
            json.dump(rows, f, indent=2)


def _train_fast(args, scene, cam):
    """Fused-kernel inverse rendering (albedo parameters)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render.integrators import radiance_hemisphere
    from fypraytracer_tpu.render.megakernel_diff import DiffRenderer

    settings = _settings(args, SamplingTechnique.COSINE)
    dscene = scene.device_put()
    B = cam.width * cam.height
    o, d = generate_rays(cam.inv_projection, cam.inv_view,
                         cam.width, cam.height, xp=jnp)
    pix = jnp.arange(B, dtype=jnp.uint32)
    tr = pick_tracer(dscene, settings.tracer)
    n_tgt = min(args.steps, 4)
    targets = {f: radiance_hemisphere(dscene, tr, o, d, pix, jnp.uint32(f),
                                      settings, "cosine")
               for f in range(1, n_tgt + 1)}

    dr = DiffRenderer(scene, cam, bounces=args.bounces,
                      sky_color=tuple(args.sky),
                      interpret=jax.default_backend() == "cpu")
    true_alb = dscene.materials.albedo
    key = jax.random.PRNGKey(0)
    alb = jnp.clip(true_alb + 0.25 * jax.random.normal(key, true_alb.shape),
                   0.05, 0.95)
    import time as _t
    t0 = _t.perf_counter()
    for i in range(args.steps):
        f = 1 + (i % n_tgt)
        alb, loss = dr.step(alb, targets[f], f, lr=args.lr * 10)
        alb = jnp.clip(alb, 0.0, 1.0)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            print(json.dumps({"step": i, "loss": float(loss)}))
    dt = (_t.perf_counter() - t0) / args.steps
    err = float(jnp.abs(alb - true_alb).mean())
    print(json.dumps({"final_albedo_mae": err, "impl": "megakernel",
                      "avg_step_ms": round(dt * 1000, 2)}))


def _train_restir(args, scene, cam, mode="restir-di"):
    """Inverse rendering THROUGH the ReSTIR reservoir estimators
    (differentiable ReSTIR: detached discrete reservoir machinery,
    differentiated shade/W factors — parallel/restir_shard.py
    ::make_restir_{di,gi}_train_step; estimators Renderer.cu:1628-2041
    (DI) and :2043-2387 (GI))."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.parallel import restir_shard as RS
    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, replicate_scene)

    gi = mode == "restir-gi"
    make_restir_di_sharded = (RS.make_restir_gi_sharded if gi
                              else RS.make_restir_di_sharded)
    make_restir_di_train_step = (RS.make_restir_gi_train_step if gi
                                 else RS.make_restir_di_train_step)
    settings = _settings(args, SamplingTechnique.RESTIR_GI if gi
                         else SamplingTechnique.RESTIR_DI)
    mesh = make_pixel_mesh(
        jax.devices()[:args.devices] if args.devices else None)
    scene_d = replicate_scene(scene, mesh)
    ip = jnp.asarray(cam.inv_projection)
    iv = jnp.asarray(cam.inv_view)
    ppv = jnp.asarray(cam.prev_proj_view)

    render, init_state = make_restir_di_sharded(scene_d, mesh, cam.width,
                                                cam.height, settings)
    target, _ = render(ip, iv, ppv, jnp.uint32(1), init_state())

    true_albedo = scene_d.materials.albedo
    key = jax.random.PRNGKey(0)
    params = dataclasses.replace(
        scene_d.materials,
        albedo=jnp.clip(true_albedo + 0.25 * jax.random.normal(
            key, true_albedo.shape), 0.05, 0.95))

    # scan-batch micro-steps into one dispatch: on the axon runtime every
    # dispatch costs ~0.4 s of tunnel overhead regardless of work, so
    # grouping is the training analog of render_many
    group = max(min(args.steps, 10), 1)
    # lr scale per estimator (test_gradients lr probes): DI's MSE sits
    # ~1e-4 -> lr ~100-150; GI's pixel values are larger -> lr ~5
    lr = args.lr * (25 if gi else 500)
    step, init_tr = make_restir_di_train_step(
        scene_d, mesh, cam.width, cam.height, settings, lr=lr,
        fields=("albedo",), steps_per_call=group, clip01=("albedo",))
    state0 = init_tr()
    done = 0
    while done < args.steps:
        params, _, losses = step(params, ip, iv, ppv, jnp.uint32(1), state0,
                                 target)
        done += group
        print(json.dumps({"step": min(done, args.steps) - 1,
                          "loss": float(jnp.asarray(losses)[-1])}))
    err = float(jnp.abs(params.albedo - true_albedo).mean())
    print(json.dumps({"final_albedo_mae": err, "impl": mode}))


def cmd_train(args):
    """Inverse-rendering demo: recover albedos from a rendered target.

    ``--impl megakernel`` uses the fused loss+gradient kernel
    (render/megakernel_diff.py; albedo parameters, cosine estimator) —
    orders of magnitude fewer op dispatches per step than the autodiff
    wavefront path."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, make_train_step, replicate_scene)

    scene, cam = _load_scene(args)
    if args.technique in ("restir-di", "restir-gi"):
        if args.impl == "megakernel":
            # the fused diff kernel trains the NEE/cosine estimator —
            # silently returning it for an explicit ReSTIR request
            # would report the wrong estimator's gradients
            raise SystemExit("--impl megakernel trains the fused "
                             "cosine-estimator kernel; it does not support "
                             f"--technique {args.technique}")
        return _train_restir(args, scene, cam, mode=args.technique)
    if args.impl == "megakernel":
        return _train_fast(args, scene, cam)
    settings = _settings(args, SamplingTechnique.NEE_MIS)
    mesh = make_pixel_mesh(jax.devices()[:args.devices] if args.devices else None)
    scene_d = replicate_scene(scene, mesh)

    # target: render with TRUE materials
    from fypraytracer_tpu.parallel.shard import sharded_render
    step = make_train_step(scene_d, mesh, cam.width, cam.height, settings,
                           lr=args.lr)
    render = sharded_render(scene_d, mesh, cam.width, cam.height,
                            settings.replace(technique=SamplingTechnique.COSINE),
                            "cosine")
    ip = jnp.asarray(cam.inv_projection)
    iv = jnp.asarray(cam.inv_view)
    target = render(ip, iv, jnp.uint32(1))

    # perturb albedos, then recover
    import dataclasses
    params = scene_d.materials
    key = jax.random.PRNGKey(0)
    params = dataclasses.replace(
        params, albedo=jnp.clip(params.albedo + 0.25 * jax.random.normal(
            key, params.albedo.shape), 0.05, 0.95))

    for i in range(args.steps):
        params, loss = step(params, ip, iv, jnp.uint32(i + 1), target)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            print(json.dumps({"step": i, "loss": float(loss)}))
    err = float(jnp.abs(params.albedo - scene_d.materials.albedo).mean())
    print(json.dumps({"final_albedo_mae": err}))


def _enable_compile_cache():
    """Persistent compile cache: remote (axon) compiles run ~40 s - 9 min;
    warm runs skip them entirely (same policy as bench.py)."""
    try:
        import jax

        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="fypraytracer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", default="cornell",
                        help="builtin name or scene .json path")
        sp.add_argument("--width", type=int, default=256)
        sp.add_argument("--height", type=int, default=256)
        sp.add_argument("--bounces", type=int, default=2)
        sp.add_argument("--samples", type=int, default=1)
        sp.add_argument("--sky", type=float, nargs=3, default=[0.05, 0.06, 0.08])
        sp.add_argument("--candidates", type=int, default=8)
        sp.add_argument("--neighbors", type=int, default=5)
        sp.add_argument("--radius", type=int, default=30)
        sp.add_argument("--history", type=int, default=2)
        sp.add_argument("--strict", action="store_true",
                        help="error if the megakernel fast path fails "
                             "instead of falling back to the wavefront")
        sp.add_argument("--gi-fast", action="store_true",
                        help="ReSTIR GI speed mode: merge spatial "
                             "neighbors without per-neighbor visibility "
                             "and trace ONE sweep on the selected winner "
                             "(~1.7x faster; small darkening bias). "
                             "Default is the reference's per-neighbor "
                             "visibility (Renderer.cu:2356-2366)")

    r = sub.add_parser("render", help="render one technique")
    common(r)
    r.add_argument("--technique", choices=sorted(_TECH), default="nee")
    r.add_argument("--frames", type=int, default=None)
    r.add_argument("--seconds", type=float, default=None)
    r.add_argument("--golden", default=None, help="golden BMP for MSE/PSNR")
    r.add_argument("--impl", choices=["auto", "wavefront", "megakernel"],
                   default="auto", help="renderer implementation")
    r.add_argument("--checkpoint-dir", default=None,
                   help="checkpoint/resume directory for long renders: "
                        "saves accumulation + reservoir state every "
                        "--checkpoint-every frames and resumes from an "
                        "existing checkpoint")
    r.add_argument("--checkpoint-every", type=int, default=64)
    r.add_argument("-o", "--out", default="RenderedImages")
    r.set_defaults(fn=cmd_render)

    b = sub.add_parser("benchmark", help="equal-budget technique comparison")
    common(b)
    b.add_argument("--techniques", default=None, help="comma list")
    b.add_argument("--frames", type=int, default=None)
    b.add_argument("--seconds", type=float, default=None)
    b.add_argument("--golden-frames", type=int, default=256,
                   help="0 = timing-only (skip the golden render + PSNR)")
    b.add_argument("--golden-technique", choices=sorted(_TECH),
                   default="nee", help="estimator for the golden image")
    b.add_argument("--burst", type=int, default=0,
                   help="frames per dispatch for burst-window timing "
                        "(0 = off): short dispatches + idle credit-refill "
                        "sleeps report TRUE kernel speed on runtimes that "
                        "throttle sustained device time (PERF.md #26)")
    b.add_argument("--burst-reps", type=int, default=4)
    b.add_argument("--burst-idle", type=float, default=2.5,
                   help="idle seconds between burst dispatches")
    b.add_argument("-o", "--out", default=None)
    b.set_defaults(fn=cmd_benchmark)

    t = sub.add_parser("train", help="inverse-rendering material fit")
    common(t)
    t.add_argument("--steps", type=int, default=30)
    t.add_argument("--lr", type=float, default=0.2)
    t.add_argument("--devices", type=int, default=None)
    t.add_argument("--impl", choices=["wavefront", "megakernel"],
                   default="wavefront",
                   help="megakernel = fused loss+albedo-grad kernel")
    t.add_argument("--technique", choices=["nee", "restir-di", "restir-gi"],
                   default="nee",
                   help="estimator to differentiate through; restir-di/"
                        "restir-gi = pixel gradients through the reservoir "
                        "estimators")
    t.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    if args.cmd == "render" and args.frames is None and args.seconds is None:
        args.frames = 16
    if args.cmd == "benchmark" and args.frames is None and args.seconds is None:
        args.frames = 16
    args.fn(args)


if __name__ == "__main__":
    main()
