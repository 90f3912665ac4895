"""Fused differentiable render step — forward + analytic backward in ONE
Pallas kernel.

The general differentiable path (parallel/shard.py::make_train_step) runs
the wavefront integrators under ``jax.grad``; on this runtime its hundreds
of XLA ops cost ~0.1-3 ms each, putting a train step 2-3 orders of
magnitude above a megakernel frame (PERF.md).  This module fuses the whole
**loss + albedo-gradient** computation for the cosine-sampled path tracer
into one kernel:

  * forward: the megakernel cosine estimator (bit-matched RNG), storing
    per-scatter data (throughput factors g_j, local derivative dg_j/dalb,
    triangle id) and per-bounce radiance contributions in VMEM;
  * backward: radiance is ``r_c = sum_b T_b,c . e_b,c`` with
    ``T_b = prod_{j<b} g_j``, so ``dr/dg_j = suffix_j / g_j`` (suffix =
    contributions collected after scatter j) — a reverse scan over the
    stored bounces, no recomputation;
  * scatter directions under cosine sampling depend only on geometry and
    the RNG, NOT on the albedo (pdf = cos/pi), so the path measure is
    constant and the analytic gradient is exactly the autodiff gradient of
    the wavefront estimator (tests pin this against jax.grad);
  * per-triangle gradients accumulate on the MXU via the TRANSPOSED
    one-hot of the attribute fetch: ``dA += onehot(T, C) @ G^T (C, 3)``;
    the host maps triangles to material ids with a segment-sum.

Gradients cover MATERIAL ALBEDO (the inverse-rendering demo's parameter
space).  Roughness/metallic/emission stay on the general autodiff path.
Reference role: none — the reference is not differentiable (SURVEY §7.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fypraytracer_tpu.render.megakernel import (
    _A_LO,
    _A_ROWS_TOT,
    _RS,
    TRI_TILE,
    _A_ALBEDO,
    _A_EMISSION,
    _A_METAL,
    _A_ROUGH,
    _SURF_ROWS,
    _cosine_dir,
    _fold,
    _next_uniform,
    _norm3,
    _pcg,
    _pick_ray_lanes,
    _u32,
    build_raygen,
    build_rows_lookup,
    build_surf_lookup,
    build_trace,
    prepare_scene_tables,
)
from fypraytracer_tpu.scene.types import Scene

_PI = 3.1415926535


def _f_and_dfdalb(nx, ny, nz, vx, vy, vz, lx, ly, lz, alb, rough, metal):
    """Cook-Torrance f_c AND its derivative w.r.t. alb_c (the c-th albedo
    channel only affects the c-th BRDF channel).  Mirrors
    megakernel._cook_torrance term for term."""
    hx, hy, hz = _norm3(vx + lx, vy + ly, vz + lz)
    ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    vdh = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
    a = rough * rough
    a2 = a * a
    k = rough * 0.5
    g = (ndv / jnp.maximum(ndv * (1.0 - k) + k, 1e-12)) \
        * (ndl / jnp.maximum(ndl * (1.0 - k) + k, 1e-12))
    den = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 * (1.0 / _PI) / jnp.maximum(den * den, 1e-12)
    spec_s = d * g / jnp.maximum(4.0 * ndv * ndl, 1e-12)
    s5 = (1.0 - vdh) ** 5
    live = (ndl > 0.0) & (ndv > 0.0)
    f, df = [], []
    for c in range(3):
        f0 = 0.04 * (1.0 - metal) + alb[c] * metal
        fr = f0 + (1.0 - f0) * s5
        dfr = metal * (1.0 - s5)                    # dfr/dalb_c
        fc = (1.0 - fr) * alb[c] * (1.0 / _PI) + spec_s * fr
        dfc = (1.0 - fr) * (1.0 / _PI) \
            + dfr * (spec_s - alb[c] * (1.0 / _PI))
        f.append(jnp.where(live, fc, 0.0))
        df.append(jnp.where(live, dfc, 0.0))
    return f, df


def make_diff_megakernel(width: int, height: int, bounces: int, sky_color,
                         n_tris: int, tri_tile: int = TRI_TILE,
                         ray_lanes: int | None = None,
                         interpret: bool = False):
    """Build ``loss_and_grad(cam_mats, P, AT, TGT, frame) ->
    (loss, dA (T, 8))`` — squared-error loss of ONE cosine-sampled frame
    against a target image, plus d(loss)/d(per-triangle albedo) in
    dA[:, 0:3].  ``TGT`` is (G*8, C) with rows 0:3 = RGB target."""
    B = width * height
    C = ray_lanes or _pick_ray_lanes(B)
    TT = tri_tile
    T = n_tris + ((-n_tris) % TT)
    G = B // C
    RS = _RS
    sky = tuple(float(c) for c in sky_color)
    assert 1 <= bounces <= 4, "diff kernel unrolls bounces (<= 4)"
    NL = bounces  # scatter levels: primary + bounces-1 (last hit collects)

    def kernel(cam_ref, frame_ref, p_ref, a_ref, tgt_ref,
               loss_ref, da_ref, rayin, trout, trouti, lkin, bank):
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)

        trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, RS)
        rows_lookup = build_rows_lookup(lkin, bank, C, RS)
        surf_lookup = build_surf_lookup(
            lambda idx, rows: rows_lookup(a_ref, T, idx, rows,
                                          lo_map=_A_LO))

        @pl.when(tile == 0)
        def _init():
            loss_ref[:] = jnp.zeros((8, 128), jnp.float32)
            da_ref[:] = jnp.zeros((T, 8), jnp.float32)

        # ---- forward (one frame, one sample; megakernel cosine parity) --
        t0, hit0, u0, v0, tri0 = trace(ox, oy, oz, dx, dy, dz)
        prim = surf_lookup(tri0, u0, v0)
        em0 = prim["em"]
        prim_emissive = hit0 & ((em0[0] * em0[0] + em0[1] * em0[1]
                                 + em0[2] * em0[2]) > 0.0)
        path_lane = hit0 & ~prim_emissive

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _fold(_pcg(pix.astype(jnp.uint32)), frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(0))

        z1 = jnp.zeros((1, C), jnp.float32)
        thr = [z1 + 1.0 for _ in range(3)]
        rad = [z1 for _ in range(3)]
        active = path_lane
        surf = prim
        cox, coy, coz = (ox + dx * t0, oy + dy * t0, oz + dz * t0)
        vx, vy, vz = -dx, -dy, -dz

        store = []   # per scatter level: dict(g, dg, tri, contribs after)
        for level in range(NL):
            nx_, ny_, nz_ = surf["nx"], surf["ny"], surf["nz"]
            key, u1 = _next_uniform(key)
            key, u2 = _next_uniform(key)
            lx, ly, lz = _cosine_dir(u1, u2, nx_, ny_, nz_)
            cos_t = jnp.maximum(lx * nx_ + ly * ny_ + lz * nz_, 0.0)
            pdf = cos_t * (1.0 / _PI)
            ok = pdf > 0.0
            f, df = _f_and_dfdalb(nx_, ny_, nz_, vx, vy, vz, lx, ly, lz,
                                  surf["alb"], surf["rough"], surf["metal"])
            scale = cos_t / jnp.where(ok, pdf, 1.0)
            g = [jnp.where(active & ok, f[c] * scale, 0.0) for c in range(3)]
            dg = [jnp.where(active & ok, df[c] * scale, 0.0)
                  for c in range(3)]
            lvl = dict(g=g, dg=dg,
                       tri=jnp.where(active & ok,
                                     tri0 if level == 0 else lvl_tri, -1),
                       contrib=[z1, z1, z1])
            for c in range(3):
                thr[c] = thr[c] * g[c]
            active = active & ok

            t, hit, uu, vv, tri = trace(cox, coy, coz, lx, ly, lz)
            surf2 = surf_lookup(tri, uu, vv)
            miss = ~hit
            em = surf2["em"]
            em_hit = (em[0] * em[0] + em[1] * em[1] + em[2] * em[2]) > 0.0
            for c in range(3):
                contrib = jnp.where(active & miss, thr[c] * sky[c], 0.0) \
                    + jnp.where(active & hit & em_hit, thr[c] * em[c], 0.0)
                rad[c] = rad[c] + contrib
                lvl["contrib"][c] = contrib
            active = active & hit & ~em_hit
            store.append(lvl)
            lvl_tri = tri
            vx, vy, vz = -lx, -ly, -lz
            cox = cox + lx * t
            coy = coy + ly * t
            coz = coz + lz * t
            surf = surf2

        out = []
        for c in range(3):
            r = jnp.where(hit0, rad[c], sky[c])
            out.append(jnp.where(prim_emissive, em0[c], r))

        # ---- loss + adjoint --------------------------------------------
        tgt = tgt_ref[:]
        inv_n = 1.0 / float(B * 3)
        err = [out[c] - tgt[c:c + 1, :] for c in range(3)]
        part = err[0] * err[0] + err[1] * err[1] + err[2] * err[2]
        psum = jnp.sum(part) * inv_n
        # every slot accumulates the same scalar; the host reads [0, 0]
        loss_ref[:] = loss_ref[:] + psum
        a_c = [2.0 * err[c] * inv_n for c in range(3)]   # dL/dr_c

        # ---- backward over stored levels -------------------------------
        suffix = [z1, z1, z1]
        for level in reversed(range(NL)):
            lvl = store[level]
            gsel = [None] * 3
            for c in range(3):
                suffix[c] = suffix[c] + lvl["contrib"][c]
                gc = lvl["g"][c]
                gok = gc > 0.0
                gsel[c] = a_c[c] * suffix[c] * lvl["dg"][c] \
                    / jnp.where(gok, gc, 1.0)
                gsel[c] = jnp.where(gok, gsel[c], 0.0)
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
            oh = (iota_t == lvl["tri"]).astype(jnp.float32)
            gmat = jnp.concatenate(
                gsel + [jnp.zeros((5, C), jnp.float32)], axis=0)  # (8, C)
            upd = jax.lax.dot_general(
                oh, gmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # (T, 8)
            da_ref[:] = da_ref[:] + upd

    grid = (G,)
    full = lambda i: (0, 0)

    @jax.jit
    def loss_and_grad(cam_mats, P, AT, TGT, frame0):
        loss, dA = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((_A_ROWS_TOT, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, 128), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 8), full, memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                       jax.ShapeDtypeStruct((T, 8), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((6 * RS, C), jnp.float32),
                pltpu.VMEM((3 * RS, C), jnp.float32),
                pltpu.VMEM((RS, C), jnp.int32),
                pltpu.VMEM((RS, C), jnp.int32),
                pltpu.VMEM((30 * RS, C), jnp.float32),
            ],
            interpret=interpret,
        )(cam_mats, frame0, P, AT, TGT)
        return loss[0, 0], dA

    return loss_and_grad


class DiffRenderer:
    """Fast inverse-rendering step: cosine-frame loss + albedo gradient.

    Usage::
        dr = DiffRenderer(scene, camera, bounces=2)
        albedo, loss = dr.step(albedo, target_hdr, frame, lr=0.2)
    """

    def __init__(self, scene: Scene, camera, bounces: int = 2,
                 sky_color=(0.05, 0.06, 0.08), interpret: bool = False):
        self.scene = jax.tree_util.tree_map(jnp.asarray, scene)
        self.camera = camera
        self.bounces = bounces
        self.interpret = interpret
        self.n_tris = scene.geometry.tri_v.shape[0]
        self.tri_mat = jnp.asarray(scene.geometry.tri_mat)
        self.n_mats = scene.materials.albedo.shape[0]
        self._fn = make_diff_megakernel(
            camera.width, camera.height, bounces, sky_color, self.n_tris,
            interpret=interpret)
        self._base_scene = scene

    def _tables(self, albedo):
        import dataclasses

        mats = dataclasses.replace(self.scene.materials, albedo=albedo)
        scene = dataclasses.replace(self.scene, materials=mats)
        return prepare_scene_tables(scene)

    def loss_and_grad(self, albedo, target_hdr, frame):
        """Returns (loss, dL/dalbedo (M, 3)) for one frame."""
        P, AT = self._tables(albedo)
        B = self.camera.width * self.camera.height
        C = _pick_ray_lanes(B)
        tgt = jnp.asarray(target_hdr, jnp.float32).reshape(B, 3)
        tgt_blocks = tgt.reshape(B // C, C, 3).transpose(0, 2, 1)
        tgt_blocks = jnp.concatenate(
            [tgt_blocks, jnp.zeros((B // C, 5, C), jnp.float32)], axis=1)
        tgt_blocks = tgt_blocks.reshape(B // C * 8, C)
        cam = jnp.concatenate([jnp.asarray(self.camera.inv_projection),
                               jnp.asarray(self.camera.inv_view)], axis=0)
        loss, dA = self._fn(cam, P, AT, tgt_blocks,
                            jnp.asarray([[frame]], jnp.int32))
        d_tri = dA[:self.n_tris, 0:3]              # (T, 3) per-triangle
        d_mat = jax.ops.segment_sum(d_tri, self.tri_mat,
                                    num_segments=self.n_mats)
        return loss, d_mat

    def step(self, albedo, target_hdr, frame, lr=0.2):
        loss, grad = self.loss_and_grad(albedo, target_hdr, frame)
        return albedo - lr * grad, loss
