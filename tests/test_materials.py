"""Material flattening parity tests (materials/mod.rs:89-228 semantics)."""

import numpy as np
import pytest

from pyrite_tpu.project import ir
from pyrite_tpu.scene import (
    BSDF_DIFFUSE,
    BSDF_EMISSIVE,
    BSDF_MIRROR,
    BSDF_REFRACTIVE,
    flatten_material,
)


def node(kind, **fields):
    return ir.MaterialNode(kind=kind, fields=fields)


def expr(kind, **fields):
    return ir.ComplexExpression(kind=kind, fields=fields)


def test_mix_probabilities():
    # mix(mirror, diffuse, 0.3): lhs (mirror) gets clamp(0.3); rhs (diffuse)
    # gets 1 - clamp(0.3). Stack order: rhs subtree first.
    mat = node(
        "mix",
        lhs=node("mirror", color=1.0),
        rhs=node("diffuse", color=0.5),
        amount=0.3,
    )
    comps = flatten_material(mat)
    assert [c.bsdf_type for c in comps] == [BSDF_DIFFUSE, BSDF_MIRROR]
    assert comps[0].probability == pytest.approx(0.7)
    assert comps[1].probability == pytest.approx(0.3)


def test_nested_mix_matches_reference_quirk():
    # mix(mix(a, b, 0.5), c, 0.4): a gets 0.4*0.5 = 0.2 and b gets
    # 1 - 0.2 = 0.8 (NOT 0.4*0.5): the reference composes the rhs branch as
    # 1 - lhs_probability (materials/mod.rs:176-195).
    inner = node("mix", lhs=node("mirror", color=1.0), rhs=node("diffuse", color=1.0), amount=0.5)
    outer = node("mix", lhs=inner, rhs=node("emissive", color=1.0), amount=0.4)
    comps = flatten_material(outer)
    # stack order: outer rhs (emissive) first, then inner rhs (diffuse), inner lhs (mirror)
    kinds = [c.bsdf_type for c in comps]
    assert kinds == [BSDF_EMISSIVE, BSDF_DIFFUSE, BSDF_MIRROR]
    assert comps[0].probability == pytest.approx(0.6)  # 1 - 0.4
    assert comps[2].probability == pytest.approx(0.2)  # 0.4 * 0.5
    assert comps[1].probability == pytest.approx(0.8)  # 1 - 0.2 (the quirk)


def test_add_material_shares_probability():
    mat = node(
        "binary",
        operator="add",
        lhs=node("emissive", color=2.0),
        rhs=node("diffuse", color=0.78),
    )
    comps = flatten_material(mat)
    assert [c.bsdf_type for c in comps] == [BSDF_DIFFUSE, BSDF_EMISSIVE]
    assert comps[0].probability is None
    assert comps[1].probability is None


def test_refractive_constants():
    mat = node(
        "refractive",
        color=1.0,
        ior=2.37782,
        dispersion=0.01371,
        env_ior=None,
        env_dispersion=None,
    )
    comps = flatten_material(mat)
    c = comps[0]
    assert c.bsdf_type == BSDF_REFRACTIVE
    assert c.ior == pytest.approx(2.37782)
    assert c.dispersion == pytest.approx(0.01371)
    assert c.env_ior == 1.0
    assert c.env_dispersion == 0.0


def test_mix_amount_expression_clamped():
    # a fresnel amount stays an expression wrapped in a clamp node
    fres = expr("fresnel", ior=1.5, env_ior=1.0)
    mat = node(
        "mix", lhs=node("mirror", color=1.0), rhs=node("diffuse", color=1.0), amount=fres
    )
    comps = flatten_material(mat)
    rhs_prob = comps[0].probability  # 1 - clamp(fresnel)
    lhs_prob = comps[1].probability  # clamp(fresnel)
    assert isinstance(lhs_prob, ir.ComplexExpression) and lhs_prob.kind == "clamp"
    assert isinstance(rhs_prob, ir.ComplexExpression) and rhs_prob.kind == "binary"
    assert rhs_prob.fields["operator"] == "sub"
    assert rhs_prob.fields["lhs"] == 1.0
    assert rhs_prob.fields["rhs"] is lhs_prob


def test_bank_table_matches_exact_eval():
    """Material-heavy scenes bake lambda-only programs into one [P, G]
    interpolation table (scene.bake_bank_tables); the table path must match
    direct per-program evaluation to interpolation accuracy, and ray-input
    programs must keep the exact loop path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyrite_tpu import exprs, scene as scene_mod, tracer
    from pyrite_tpu.project import ir

    sc = scene_mod.Scene()
    sc.resources = exprs.Resources()

    rng = np.random.default_rng(11)
    for i in range(10):
        if i % 3 == 0:
            expr = ir.ComplexExpression(
                "rgb",
                {"red": float(rng.uniform()), "green": float(rng.uniform()),
                 "blue": float(rng.uniform())},
            )
        elif i % 3 == 1:
            pts = np.clip(rng.uniform(0, 1, 6), 0, 1)
            expr = ir.ComplexExpression(
                "spectrum",
                {"spectrum": ir.SpectrumIR(
                    format="array", min=400.0, max=740.0, points=list(pts)
                )},
            )
        else:
            expr = ir.ComplexExpression(
                "binary",
                {"operator": "mul", "lhs": float(0.3 + 0.1 * i),
                 "rhs": ir.ComplexExpression("blackbody", {"temperature": 5500.0 + 100 * i})},
            )
        sc.color_programs.append(exprs.compile_program(expr, sc.resources, exprs.NUMBER))

    scene_mod.bake_bank_tables(sc, (380.0, 780.0))
    assert sc.color_bank_bakeable is not None and all(sc.color_bank_bakeable)

    n, s = 64, 4
    wl = jnp.asarray(rng.uniform(380.0, 780.0, (n, s)).astype(np.float32))
    prog_id = jnp.asarray(rng.integers(0, 10, n).astype(np.int32))
    inputs = exprs.ProgramInputs(wavelength=wl)

    got = np.asarray(tracer.eval_color_bank(sc, prog_id, inputs))

    want = np.zeros((n, s), np.float32)
    for p, prog in enumerate(sc.color_programs):
        val = np.broadcast_to(np.asarray(prog(inputs)), (n, s))
        want = np.where((np.asarray(prog_id) == p)[:, None], val, want)

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # below the threshold no table is built (exact path preserved)
    small = scene_mod.Scene()
    small.resources = exprs.Resources()
    for i in range(3):
        small.color_programs.append(
            exprs.compile_program(float(i + 1), small.resources, exprs.NUMBER)
        )
    scene_mod.bake_bank_tables(small, (380.0, 780.0))
    assert small.color_bank_bakeable is None
    assert "color_bank" not in small.arrays


def test_bank_table_cost_independent_of_program_count():
    """VERDICT item: material-heavy scenes must not pay O(P) per bounce.
    With the baked [P, G] bank table, eval_color_bank is one table gather
    regardless of P — its jaxpr must not grow with the program count
    (64 programs vs 8 programs: same equation count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyrite_tpu import exprs, scene as scene_mod, tracer
    from pyrite_tpu.project import ir

    def build(p_count):
        sc = scene_mod.Scene()
        sc.resources = exprs.Resources()
        rng = np.random.default_rng(3)
        for i in range(p_count):
            expr = ir.ComplexExpression(
                "rgb",
                {"red": float(rng.uniform()), "green": float(rng.uniform()),
                 "blue": float(rng.uniform())},
            )
            sc.color_programs.append(
                exprs.compile_program(expr, sc.resources, exprs.NUMBER)
            )
        scene_mod.bake_bank_tables(sc, (380.0, 780.0))
        assert sc.color_bank_bakeable is not None
        # renders bind device arrays (scene.bind); tracing needs jnp here
        sc.arrays["color_bank"] = jnp.asarray(sc.arrays["color_bank"])
        return sc

    def count_eqns(sc):
        wl = jnp.zeros((32, 4)) + 500.0
        prog_id = jnp.zeros(32, jnp.int32)
        jaxpr = jax.make_jaxpr(
            lambda w, p: tracer.eval_color_bank(
                sc, p, exprs.ProgramInputs(wavelength=w)
            )
        )(wl, prog_id)
        return len(jaxpr.jaxpr.eqns)

    small, big = count_eqns(build(8)), count_eqns(build(64))
    assert big == small, f"bank eval grew with program count: {small} -> {big}"
