"""Phase-split microbench for the cluster (wide-BVH) bounce on TPU.

Times, at the regen lane width on the synthetic terrain scene, jitted
fori_loops over each phase in isolation so the per-iteration cost of the
cluster bounce decomposes:
  ext     -- extension traversal alone (intersect_scene closest-hit walk)
  shadow  -- one NEE shadow batch alone (light_samples flattened lanes,
             any-hit walk with early exit)
  shade   -- bounce_core with a PRECOMPUTED hit and light_samples=0
             (surface data, programs, miss/emission, scatter — no walks)
  bounce  -- the full bounce_core (ext + shadow + shade)
  regen   -- the shipped regen body (bounce + expose + fresh + bookkeeping)

Usage: python tools/tpu_cluster_phase.py [iters]
"""

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import bench
from tools.synthetic import terrain_scene
from pyrite_tpu import tracer
from pyrite_tpu.renderers.simple import _regen_planes, _trace_state, pick_rows
from pyrite_tpu.tracer import TraceConfig, bounce_core, intersect_scene


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    lua, tris = terrain_scene(
        tempfile.mkdtemp(), cells=405, width=256, height=128, spp=8, bounces=4
    )
    _, scene, film, camera, cfg = bench._build(lua)
    rows = pick_rows(film, scene, cfg)
    planes = _regen_planes(film, rows, scene.use_clusters)
    w = film.width
    n = rows * w * planes
    s = cfg.spectrum_samples
    print(f"tris={tris} lanes={n} light_samples={cfg.light_samples} iters={iters}")

    def fresh(key):
        u = jax.random.uniform(key, (n, s + 5))
        py, px = jnp.meshgrid(jnp.arange(rows), jnp.arange(w), indexing="ij")
        pxf = jnp.tile(px.reshape(-1), planes) + u[:, 0]
        pyf = jnp.tile(py.reshape(-1), planes) + u[:, 1]
        positions = film.pixel_to_view(pxf, pyf)
        origin, direction = camera.ray_towards(positions, u[:, 2], u[:, 3])
        wavelengths = film.sample_wavelengths(u[:, 4 : 4 + s])
        return origin, direction, wavelengths

    data = scene.device_data()
    key = jax.random.PRNGKey(0)

    def timed(name, fn):
        f = jax.jit(fn)
        out = float(f(key, data))  # compile + warm
        t0 = time.time()
        reps = 3
        for r in range(reps):
            out += float(f(jax.random.fold_in(key, r), data))
        dt = (time.time() - t0) / reps / iters
        print(f"{name:8s} {dt * 1e3:8.2f} ms/iter")

    def ext_fn(key, data):
        with scene.bind(data):
            o, d, wl = fresh(jax.random.fold_in(key, 99))

            def body(i, carry):
                o, d, acc = carry
                hit = intersect_scene(scene, o, d, cfg)
                # permute LANES (o and d together: same ray set, so the
                # walk work per iteration is representative; rolling d
                # alone would pair mismatched origins/directions, which
                # sweep pathologically many leaves)
                return (
                    jnp.roll(o, 1, axis=0), jnp.roll(d, 1, axis=0),
                    acc + jnp.sum(jnp.where(hit["t"] < 1e30, hit["t"], 0.0)),
                )

            _, _, acc = jax.lax.fori_loop(0, iters, body, (o, d, jnp.float32(0)))
            return acc

    def shadow_fn(key, data):
        with scene.bind(data):
            o, d, wl = fresh(jax.random.fold_in(key, 99))
            # NEE-realistic queries: from the first hit position toward a
            # fixed lamp point above the terrain, one batch of
            # light_samples * n lanes like trace_direct's flattened batch
            hit = intersect_scene(scene, o, d, cfg)
            t0 = jnp.where(hit["t"] < 1e30, hit["t"], 1.0)
            pos = o + d * (t0[:, None] * 0.999)
            lamp = jnp.asarray([0.0, 40.0, 0.0])
            ls = max(cfg.light_samples, 1)
            of = jnp.tile(pos, (ls, 1))
            to_lamp = lamp[None, :] - of
            dist = jnp.linalg.norm(to_lamp, axis=1)
            df = to_lamp / jnp.maximum(dist, 1e-6)[:, None]

            def body(i, carry):
                of, df, dist, acc = carry
                t = tracer.intersect_shadow(
                    scene, of, df, cfg, max_dist=dist,
                    block_below=dist - 1e-4,
                )
                roll = lambda x: jnp.roll(x, 1, axis=0)
                return roll(of), roll(df), roll(dist), acc + jnp.sum(
                    jnp.where(jnp.isfinite(t), t, 0.0)
                )

            _, _, _, acc = jax.lax.fori_loop(
                0, iters, body, (of, df, dist, jnp.float32(0))
            )
            return acc

    def shade_fn(key, data):
        with scene.bind(data):
            o, d, wl = fresh(jax.random.fold_in(key, 99))
            st = _trace_state(o, d, s)
            hit = intersect_scene(scene, o, d, cfg)
            cfg0 = TraceConfig(
                bounces=cfg.bounces, light_samples=0,
                spectrum_samples=cfg.spectrum_samples,
                max_de_steps=cfg.max_de_steps,
            )

            def body(i, carry):
                st, acc = carry
                st2, _ = bounce_core(
                    scene, cfg0, wl, st, jax.random.fold_in(key, i), hit=hit
                )
                st2["alive"] = st["alive"]
                st2["origin"] = st["origin"]
                st2["direction"] = st["direction"]
                return st2, acc + jnp.sum(st2["brightness"][:, 0])

            _, acc = jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))
            return acc

    def bounce_fn(key, data):
        with scene.bind(data):
            o, d, wl = fresh(jax.random.fold_in(key, 99))
            st = _trace_state(o, d, s)

            def body(i, carry):
                st, acc = carry
                st2, _ = bounce_core(
                    scene, cfg, wl, st, jax.random.fold_in(key, i)
                )
                st2["alive"] = st["alive"]  # keep full occupancy
                return st2, acc + jnp.sum(st2["brightness"][:, 0])

            _, acc = jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))
            return acc

    timed("ext", ext_fn)
    timed("shadow", shadow_fn)
    timed("shade", shade_fn)
    timed("bounce", bounce_fn)


if __name__ == "__main__":
    main()
