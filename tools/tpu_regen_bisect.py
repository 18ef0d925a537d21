"""Bisect the regen-scheduler body's per-iteration cost on TPU.

The spheres_regen A/B measured ~112 ms per while-loop iteration at 524k
lanes while the one-shot path's bounce_core while-loop iteration costs
~12.6 ms at the same width. This times a FIXED-count fori_loop over
variants of the regen body with pieces disabled, so the per-iteration
cost of each piece is isolated (same loop structure, same carry shapes).

Usage: python tools/tpu_regen_bisect.py [iters] [variant ...]
Variants: full bounce_only no_expose no_fresh no_book fresh_only expose_only
Structural variants (isolate the non-additive full-combination blowup):
  full_nospp   -- regen every dead lane (drop the done<spp_lane data dep)
  full_nowl    -- never update carried wavelengths (drop the wl where-chain)
  full_noplen  -- drop the post-bounce per-lane depth budget masking
  full_barrier -- exact semantics; optimization_barrier cuts done->reg fusion
  full_lagspp  -- quota bool carried from the previous iteration (lane may
                  overshoot its quota by <=1 in-flight sample; unbiased)
  prod         -- the SHIPPED round-3 body: unconditional regen, quota
                  enforced at exposure (include = complete & done<spp),
                  live counter carried (mirrors simple.make_regen_step body)
  prod_noinc   -- prod minus the done->include exposure gate
  prod_nolive  -- prod minus the live-lane counter reduction
  prod_noalive -- live drops the vacuous & post-regen alive (always true:
                  every dead lane regenerates) -> live = sum(done2 < spp)
  prod_shared  -- one post-update done tensor feeds both gates: include =
                  complete & (done2 <= spp), live = sum(done2 < spp)
                  (SHIPPED as the default body in round 4: 15.5 vs prod's
                  36.7 ms/iter at 524k lanes)
  prod_barrier -- exact prod semantics; optimization_barrier on the
                  exposure quota gate
Pass 'hlo' as a variant name to dump per-variant compiled-HLO copy/fusion
counts instead of timing.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import bench
from pyrite_tpu.renderers.simple import _regen_planes, _trace_state, pick_rows
from pyrite_tpu.renderers.simple import _accumulate_lane_bins
from pyrite_tpu.tracer import bounce_core

REF = "/root/reference/pyrite/test"


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    wanted = sys.argv[2:] or [
        "full", "bounce_only", "no_expose", "no_fresh", "no_book",
        "fresh_only", "expose_only",
    ]

    _, scene, film, camera, cfg = bench._build(f"{REF}/spheres/spheres.lua")
    rows = pick_rows(film, scene, cfg)
    planes = _regen_planes(film, rows, scene.use_clusters)
    w = film.width
    pix = rows * w
    n = pix * planes
    s = cfg.spectrum_samples
    print(f"lanes={n} planes={planes} iters={iters}")

    def fresh_rays(key, row0):
        u = jax.random.uniform(key, (n, s + 5))
        py, px = jnp.meshgrid(
            row0 + jnp.arange(rows), jnp.arange(w), indexing="ij"
        )
        pxf = jnp.tile(px.reshape(-1), planes) + u[:, 0]
        pyf = jnp.tile(py.reshape(-1), planes) + u[:, 1]
        positions = film.pixel_to_view(pxf, pyf)
        origin, direction = camera.ray_towards(positions, u[:, 2], u[:, 3])
        wavelengths = film.sample_wavelengths(u[:, 4 : 4 + s])
        hero = jnp.minimum((u[:, 4 + s] * s).astype(jnp.int32), s - 1)
        cols = jnp.arange(s)[None, :]
        is_hero = cols == hero[:, None]
        hero_wl = jnp.sum(
            jnp.where(is_hero, wavelengths, 0.0), axis=1, keepdims=True
        )
        first_wl = wavelengths[:, :1]
        wavelengths = jnp.where(
            cols == 0, hero_wl, jnp.where(is_hero, first_wl, wavelengths)
        )
        return origin, direction, wavelengths

    def make_prod(variant):
        """Mirror simple.make_regen_step's shipped body() exactly (modulo
        the row0/while-cond scaffolding): unconditional overshoot regen,
        quota enforced at exposure, live counter in the carry."""
        gate_inc = variant != "prod_noinc"
        count_live = variant != "prod_nolive"

        def step(key, data, spp_lane):
            with scene.bind(data):
                k_gen = jax.random.fold_in(key, 7919)
                k_tr = jax.random.fold_in(key, 7)
                o0, d0, wl0 = fresh_rays(jax.random.fold_in(k_gen, 99), 0)
                st = _trace_state(o0, d0, s)
                carry = {
                    "i": jnp.int32(0),
                    "state": st,
                    "wl": wl0,
                    "acc_l": jnp.zeros((n, film.bins)),
                    "wt_l": jnp.zeros((n, film.bins)),
                    "done": jnp.zeros(n, jnp.int32),
                    "pend": jnp.ones(n, bool),
                    "plen": jnp.zeros(n, jnp.int32),
                    "live": jnp.float32(0.0),
                }

                def body(_, c):
                    st = c["state"]
                    complete = c["pend"] & ~st["alive"]
                    done = c["done"] + complete.astype(jnp.int32)
                    if variant == "prod_shared":
                        # one post-update comparison serves both gates:
                        # complete lanes have done = c.done+1, so
                        # c.done < spp  <=>  done <= spp  on those lanes
                        include = complete & (done <= spp_lane)
                    elif variant == "prod_barrier":
                        include = complete & jax.lax.optimization_barrier(
                            c["done"] < spp_lane
                        )
                    elif gate_inc:
                        include = complete & (c["done"] < spp_lane)
                    else:
                        include = complete
                    acc_l, wt_l = _accumulate_lane_bins(
                        film, c["acc_l"], c["wt_l"], c["wl"], st["brightness"],
                        st["aux_alive"], include,
                    )
                    pend = c["pend"] & st["alive"]
                    reg = ~st["alive"]
                    # i + 1000: avoid the warm-start key fold_in(k_gen, 99)
                    o2, d2, wl2 = fresh_rays(
                        jax.random.fold_in(k_gen, c["i"] + 1000), 0
                    )
                    rc = reg[:, None]
                    st = {
                        "origin": jnp.where(rc, o2, st["origin"]),
                        "direction": jnp.where(rc, d2, st["direction"]),
                        "brightness": jnp.where(rc, 0.0, st["brightness"]),
                        "reflectance": jnp.where(rc, 1.0, st["reflectance"]),
                        "alive": st["alive"] | reg,
                        "aux_alive": jnp.where(reg, True, st["aux_alive"]),
                        "sample_light": jnp.where(reg, True, st["sample_light"]),
                        "light_events": jnp.where(reg, 0, st["light_events"]),
                    }
                    wl = jnp.where(rc, wl2, c["wl"])
                    pend = pend | reg
                    plen = jnp.where(reg, 0, c["plen"])
                    live = c["live"]
                    if count_live:
                        quota = done < spp_lane
                        if variant in ("prod_noalive", "prod_shared"):
                            # post-regen alive is vacuously all-true
                            # (unconditional restart), so drop the & edge
                            live = live + jnp.sum(quota.astype(jnp.float32))
                        else:
                            live = live + jnp.sum(
                                (st["alive"] & quota).astype(jnp.float32)
                            )
                    st, _ = bounce_core(
                        scene, cfg, wl, st, jax.random.fold_in(k_tr, c["i"])
                    )
                    plen = plen + st["alive"].astype(jnp.int32)
                    st["alive"] = st["alive"] & (plen < cfg.bounces)
                    return {
                        "i": c["i"] + 1, "state": st, "wl": wl,
                        "acc_l": acc_l, "wt_l": wt_l, "done": done,
                        "pend": pend, "plen": plen, "live": live,
                    }

                c = jax.lax.fori_loop(0, iters, body, carry)
                return c["acc_l"].sum() + c["state"]["brightness"].sum()

        return jax.jit(step)

    def make(variant):
        if variant.startswith("prod"):
            return make_prod(variant)
        fullish = variant.startswith("full")
        do_expose = fullish or variant in ("no_fresh", "no_book", "expose_only")
        do_fresh = fullish or variant in ("no_expose", "no_book", "fresh_only")
        do_bounce = fullish or variant in (
            "bounce_only", "no_expose", "no_fresh", "no_book"
        )
        do_book = fullish or variant in ("no_expose", "no_fresh")
        use_spp = variant != "full_nospp"
        upd_wl = variant != "full_nowl"
        use_plen = variant != "full_noplen"

        def step(key, data, spp_lane):
            with scene.bind(data):
                k_gen = jax.random.fold_in(key, 7919)
                k_tr = jax.random.fold_in(key, 7)
                o0, d0, wl0 = fresh_rays(jax.random.fold_in(k_gen, 99), 0)
                st = _trace_state(o0, d0, s)
                carry = {
                    "i": jnp.int32(0),
                    "state": st,
                    "wl": wl0,
                    "acc_l": jnp.zeros((n, film.bins)),
                    "wt_l": jnp.zeros((n, film.bins)),
                    "done": jnp.zeros(n, jnp.int32),
                    "pend": jnp.ones(n, bool),
                    "plen": jnp.zeros(n, jnp.int32),
                    "quota": jnp.ones(n, bool),
                }

                def body(_, c):
                    st = c["state"]
                    acc_l, wt_l, done, pend, plen, wl = (
                        c["acc_l"], c["wt_l"], c["done"], c["pend"],
                        c["plen"], c["wl"],
                    )
                    if do_book:
                        complete = pend & ~st["alive"]
                        done = done + complete.astype(jnp.int32)
                        pend = pend & st["alive"]
                    else:
                        complete = ~st["alive"]
                    if do_expose:
                        acc_l, wt_l = _accumulate_lane_bins(
                            film, acc_l, wt_l, wl, st["brightness"],
                            st["aux_alive"], complete,
                        )
                    if do_fresh:
                        if do_book and use_spp:
                            if variant == "full_barrier":
                                quota = jax.lax.optimization_barrier(
                                    done < spp_lane
                                )
                            elif variant == "full_lagspp":
                                quota = c["quota"]
                            else:
                                quota = done < spp_lane
                            reg = ~st["alive"] & quota
                        else:
                            reg = ~st["alive"]
                        # i + 1000: the warm-start key is fold_in(k_gen, 99);
                        # offsetting the in-loop stream avoids colliding with
                        # it at iteration 99 (which would duplicate the
                        # initial ray batch)
                        o2, d2, wl2 = fresh_rays(
                            jax.random.fold_in(k_gen, c["i"] + 1000), 0
                        )
                        rc = reg[:, None]
                        st = {
                            "origin": jnp.where(rc, o2, st["origin"]),
                            "direction": jnp.where(rc, d2, st["direction"]),
                            "brightness": jnp.where(rc, 0.0, st["brightness"]),
                            "reflectance": jnp.where(rc, 1.0, st["reflectance"]),
                            "alive": st["alive"] | reg,
                            "aux_alive": jnp.where(reg, True, st["aux_alive"]),
                            "sample_light": jnp.where(reg, True, st["sample_light"]),
                            "light_events": jnp.where(reg, 0, st["light_events"]),
                        }
                        if upd_wl:
                            wl = jnp.where(rc, wl2, wl)
                        if do_book:
                            pend = pend | reg
                            plen = jnp.where(reg, 0, plen)
                    if do_bounce:
                        st, _ = bounce_core(
                            scene, cfg, wl, st, jax.random.fold_in(k_tr, c["i"])
                        )
                    if do_book and use_plen:
                        plen = plen + st["alive"].astype(jnp.int32)
                        st["alive"] = st["alive"] & (plen < cfg.bounces)
                    return {
                        "i": c["i"] + 1, "state": st, "wl": wl,
                        "acc_l": acc_l, "wt_l": wt_l, "done": done,
                        "pend": pend, "plen": plen,
                        "quota": done < spp_lane,
                    }

                c = jax.lax.fori_loop(0, iters, body, carry)
                return c["acc_l"].sum() + c["state"]["brightness"].sum()

        return jax.jit(step)

    data = scene.device_data()
    spp_lane = jnp.full(n, 1_000_000, jnp.int32)  # never exhausted
    hlo_mode = "hlo" in wanted
    wanted = [v for v in wanted if v != "hlo"]
    for variant in wanted:
        step = make(variant)
        key = jax.random.PRNGKey(0)
        if hlo_mode:
            import re
            from collections import Counter

            txt = step.lower(key, data, spp_lane).compile().as_text()
            shapes = Counter(
                m.group(1)
                for m in re.finditer(r"= (\S+?) copy\(", txt)
            )
            fus = txt.count(" fusion(")
            print(f"{variant:12s} fusions={fus} copies={dict(shapes)}")
            continue
        float(step(key, data, spp_lane))  # warm/compile
        t0 = time.time()
        reps = 3
        out = 0.0
        for r in range(reps):
            out += float(step(jax.random.fold_in(key, r), data, spp_lane))
        dt = (time.time() - t0) / reps / iters
        print(f"{variant:12s} {dt * 1e3:8.2f} ms/iter")


if __name__ == "__main__":
    main()
