"""Targeted single-metric benchmark runs for TPU A/B sessions.

Each subcommand prints ONE line: `<name> <value> <unit>`. Scheduler and
kernel knobs ride in via the PYRITE_TPU_* environment variables (see
CLAUDE.md), so an A/B is two shell invocations of the same subcommand.

Usage: python tools/tpu_ab.py <case> [args...]
Cases:
  spheres_regen            live/executed Mrays/s, regen scheduler
  spheres_oneshot          live/executed Mrays/s, one-shot wavefront
  terrain_regen [cells]    live/executed Mrays/s, regen scheduler on the
                           synthetic terrain (default cells=405, 328k tris)
  terrain_oneshot [cells]  live Mrays/s, one-shot wavefront on the terrain
  cornell [spp]            spp/s, bidirectional renderer (gate via
                           PYRITE_TPU_REGEN_BDPT_MIN=1 to force regen)
  snowflake [spp]          spp/s, bidirectional 256-bounce camera budget
  diamonds [spp]           spp/s, simple 256-bounce regen scheduler
  dragon [spp]             spp/s, synthetic dragon-class BDPT (871k tris)
  textures [spp]           spp/s, simple renderer with textures + normal maps
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (repo-root bench.py)

REF = "/root/reference/pyrite/test"


def main():
    if "--cpu" in sys.argv:  # axon ignores JAX_PLATFORMS; force in-process
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    case = sys.argv[1]
    arg = lambda i, d: type(d)(sys.argv[i]) if len(sys.argv) > i else d  # noqa: E731

    if case == "spheres_regen":
        # optional spp-per-launch arg: the launch tail (max over lanes of
        # quota-completion time) amortizes with bigger per-launch quotas
        spp = arg(2, 16)
        live, executed = bench.bench_simple_regen(
            f"{REF}/spheres/spheres.lua", spp=spp
        )
        print(f"spheres_regen spp={spp} live={live:.1f} executed={executed:.1f} Mrays/s")
    elif case == "spheres_oneshot":
        live, executed = bench.bench_simple(f"{REF}/spheres/spheres.lua")
        print(f"spheres_oneshot live={live:.1f} executed={executed:.1f} Mrays/s")
    elif case in ("terrain_regen", "terrain_oneshot"):
        from tools.synthetic import terrain_scene

        lua, tris = terrain_scene(
            tempfile.mkdtemp(), cells=arg(2, 405), width=256, height=128,
            spp=8, bounces=4,
        )
        if case == "terrain_regen":
            live, executed = bench.bench_simple_regen(lua, spp=arg(3, 8), reps=2)
        else:
            live, executed = bench.bench_simple(lua, steps=3)
        print(f"{case} tris={tris} live={live:.3f} executed={executed:.3f} Mrays/s")
    elif case == "cornell":
        rate = bench.bench_render_spp(f"{REF}/cornell/cornell.lua", samples=arg(2, 4))
        print(f"cornell {rate:.4f} spp/s")
    elif case == "snowflake":
        # >= 3 progress reports needed for a rate (the regen-BDPT scheduler
        # reports once per multi-sample launch; 4 spp fit in one -> nan)
        rate = bench.bench_render_spp(
            f"{REF}/snowflake/snowflake.lua", samples=arg(2, 12)
        )
        print(f"snowflake {rate:.4f} spp/s")
    elif case == "diamonds":
        rate = bench.bench_regen_spp(
            f"{REF}/diamonds/diamonds.lua", spp=arg(2, 16), reps=2
        )
        print(f"diamonds {rate:.4f} spp/s")
    elif case == "dragon":
        rate, tris = bench.bench_dragon_bdpt(samples=arg(2, 96))
        print(f"dragon tris={tris} {rate:.4f} spp/s")
    elif case == "textures":
        rate = bench.bench_render_spp(
            f"{REF}/textures/textures.lua", algorithm="simple", samples=arg(2, 8)
        )
        print(f"textures {rate:.4f} spp/s")
    else:
        raise SystemExit(f"unknown case {case!r}")


if __name__ == "__main__":
    main()
