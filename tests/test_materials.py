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
