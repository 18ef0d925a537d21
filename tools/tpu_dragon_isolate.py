"""Isolate the dragon-class TPU worker crash: run the regen-BDPT steps one
at a time (lamp -> compact -> splat -> cam) at a given light-bounce budget,
timing each stage and fetching after each so the failing launch is exact.

Usage: python tools/tpu_dragon_isolate.py [light_bounces] [rounds] [stage]
Stage is cumulative: lamp | compact | splat | cam (default cam).
"""

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tools.synthetic import dragon_scene
from pyrite_tpu.project import load_project
from pyrite_tpu.scene import CameraModel, build_scene
from pyrite_tpu.film import Film
from pyrite_tpu.tracer import TraceConfig
import pyrite_tpu.renderers.bidirectional as B

STAGES = ["lamp", "compact", "splat", "cam"]


def main():
    lb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    last = sys.argv[3] if len(sys.argv) > 3 else "cam"
    lua, tris = dragon_scene(tempfile.mkdtemp(), cells=660, light_bounces=lb)
    pd = load_project(lua)
    scene = build_scene(pd)
    settings = pd.project.renderer
    film = Film(
        width=pd.project.image.width, height=pd.project.image.height,
        bins=settings.spectrum_bins, span=settings.spectrum_span,
    )
    camera = CameraModel.from_ir(pd.project.camera)
    cfg = TraceConfig(
        bounces=settings.bounces, light_samples=settings.light_samples,
        spectrum_samples=settings.spectrum_samples,
    )
    rows = B.pick_rows_per_chunk(
        film, lb, settings.spectrum_samples, scene=scene, bounces=settings.bounces
    )
    pix = rows * film.width
    print(f"tris={tris} lb={lb} rows={rows} pix={pix} rounds={rounds}", flush=True)
    data = scene.device_data()
    acc, wt = film.new_buffers()
    st = B.make_regen_bdpt_steps(scene, film, camera, cfg, lb, rows, rounds=rounds)
    key = jax.random.PRNGKey(0)
    slots = lb + 1
    t0 = time.time()

    conns, wls = [], []
    for r in range(rounds):
        k_r = jax.random.fold_in(key, 1009 + r)
        conn, wl, count = st["lamp"](k_r, data, jnp.int32(r))
        c = int(count)
        print(f"lamp[{r}] ok count={c} t={time.time()-t0:.1f}s", flush=True)
        if last == "lamp":
            continue
        k_new = 4
        while k_new < c and k_new < slots:
            k_new *= 2
        k_new = min(k_new, slots)
        conn = st["compact"](conn, k_new)
        float(conn["pp"].sum())
        print(f"compact[{r}] ok k_new={k_new} t={time.time()-t0:.1f}s", flush=True)
        if last == "compact":
            continue
        acc, wt = st["splat"](acc, wt, conn, wl, data, jnp.ones(pix, jnp.float32))
        float(acc.sum())
        print(f"splat[{r}] ok t={time.time()-t0:.1f}s", flush=True)
        conns.append(conn)
        wls.append(wl)
    if last == "cam" and conns:
        conn_r, wl_r = st["stack"](conns, wls)
        spp = jnp.full(pix, len(conns), jnp.int32)
        if B._CAM_ITER_CAP > 0 and scene.use_clusters:
            carry = st["carry0"](conn_r["conn_ok"].shape[2])
            launches = 0
            while True:
                carry, more = st["cam_iter"](key, data, conn_r, wl_r, 0, spp, carry)
                m = bool(more)
                launches += 1
                print(
                    f"cam_iter[{launches}] ok i={int(carry['i'])} more={m} "
                    f"t={time.time()-t0:.1f}s", flush=True,
                )
                if not m:
                    break
            acc, wt, _, _ = st["cam_finish"](
                acc, wt, key, data, conn_r, wl_r, 0, spp, carry
            )
        else:
            acc, wt, _, _ = st["cam"](acc, wt, key, data, conn_r, wl_r, 0, spp)
        print(f"cam ok acc={float(acc.sum()):.3f} t={time.time()-t0:.1f}s", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
