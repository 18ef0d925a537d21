"""Synthetic large-mesh scene generation for benchmarks and perf tests.

The reference's large-mesh workload is the ~870k-triangle dragon
(test/dragon/dragon.lua) whose OBJ is stripped from the checkout
(.MISSING_LARGE_BLOBS), so dragon-class traversal performance is exercised
with synthetic meshes: a fractal-noise heightfield (spatially coherent,
BVH-friendly, with real occlusion depth like a scanned model).
"""

import os

import numpy as np


def terrain_obj(path: str, cells: int = 405, seed: int = 7) -> int:
    """Write a heightfield OBJ with 2*cells^2 triangles; returns tri count.

    405 cells -> 328,050 triangles (the round-1/2 perf scene);
    660 cells -> 871,200 triangles (dragon-class).
    """
    rng = np.random.default_rng(seed)
    n = cells + 1
    # multi-octave value noise for a rugged, occluding surface
    height = np.zeros((n, n), np.float32)
    for octave in range(5):
        step = max(cells >> (2 * octave + 2), 1)
        coarse = rng.normal(size=(n // step + 2, n // step + 2)).astype(np.float32)
        ys = np.linspace(0, coarse.shape[0] - 1.001, n)
        xs = np.linspace(0, coarse.shape[1] - 1.001, n)
        yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
        yf, xf = ys - yi, xs - xi
        interp = (
            coarse[yi][:, xi] * (1 - yf)[:, None] * (1 - xf)[None, :]
            + coarse[yi + 1][:, xi] * yf[:, None] * (1 - xf)[None, :]
            + coarse[yi][:, xi + 1] * (1 - yf)[:, None] * xf[None, :]
            + coarse[yi + 1][:, xi + 1] * yf[:, None] * xf[None, :]
        )
        height += interp * (1.5 ** -octave)

    xs = np.linspace(-10.0, 10.0, n, dtype=np.float32)
    zs = np.linspace(0.0, 20.0, n, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="xy")
    verts = np.stack([gx, height, gz], axis=-1).reshape(-1, 3)

    ii, jj = np.meshgrid(np.arange(cells), np.arange(cells), indexing="ij")
    v00 = (ii * n + jj).ravel()
    v01 = v00 + 1
    v10 = v00 + n
    v11 = v10 + 1
    f1 = np.stack([v00, v10, v01], axis=1)
    f2 = np.stack([v01, v10, v11], axis=1)
    faces = np.concatenate([f1, f2]) + 1  # OBJ is 1-based

    with open(path, "w") as fh:
        fh.write("o terrain\n")
        np.savetxt(fh, verts, fmt="v %.5f %.5f %.5f")
        np.savetxt(fh, faces, fmt="f %d %d %d")
    return len(faces)


TERRAIN_SCENE = """
return {
    image = {width = %(w)d, height = %(h)d},
    camera = camera.perspective {
        fov = 60,
        transform = transform.look_at {
            from = vector(0, 6, -4), to = vector(0, 0, 10),
        },
    },
    renderer = renderer.simple {
        pixel_samples = %(spp)d,
        spectrum_samples = 4,
        light_samples = 1,
        bounces = %(bounces)d,
    },
    world = {
        sky = 0.4,
        objects = {
            shape.mesh {
                file = "%(obj)s", materials = {
                    terrain = {surface = material.diffuse {color = 0.7}},
                },
            },
            shape.sphere {
                radius = 2.0, position = vector(0, 14, 10),
                material = {surface = material.emissive {color = light_source.d65 * 4}},
            },
        },
    },
}
"""


DRAGON_SCENE = """
return {
    image = {width = %(w)d, height = %(h)d},
    camera = camera.perspective {
        fov = 60,
        transform = transform.look_at {
            from = vector(0, 6, -4), to = vector(0, 0, 10),
        },
    },
    renderer = renderer.bidirectional {
        pixel_samples = %(spp)d,
        spectrum_samples = 4,
        light_samples = 1,
        bounces = %(bounces)d,
        light_bounces = %(light_bounces)d,
    },
    world = {
        sky = 0.4,
        objects = {
            shape.mesh {
                file = "%(obj)s", materials = {
                    terrain = {surface = material.diffuse {color = 0.7}},
                },
            },
            shape.sphere {
                radius = 2.0, position = vector(0, 14, 10),
                material = {surface = material.emissive {color = light_source.d65 * 4}},
            },
        },
    },
}
"""


def dragon_scene(
    tmpdir: str,
    cells: int = 660,
    width: int = 256,
    height: int = 128,
    spp: int = 4,
    bounces: int = 20,
    light_bounces: int = 256,
):
    """Dragon-class workload stand-in: the reference's dragon.lua is a
    ~870k-tri OBJ (stripped blob, .MISSING_LARGE_BLOBS) rendered with BDPT at
    bounces 20 / light_bounces 256 (test/dragon/dragon.lua:2-12). Same
    renderer configuration over the synthetic heightfield (660 cells ->
    871,200 triangles). Returns (lua_path, tri_count)."""
    obj_path = os.path.join(tmpdir, f"terrain_{cells}.obj")
    tris = terrain_obj(obj_path, cells)
    lua_path = os.path.join(tmpdir, f"dragon_{cells}.lua")
    with open(lua_path, "w") as fh:
        fh.write(
            DRAGON_SCENE
            % {
                "w": width,
                "h": height,
                "spp": spp,
                "bounces": bounces,
                "light_bounces": light_bounces,
                "obj": obj_path,
            }
        )
    return lua_path, tris


def terrain_scene(
    tmpdir: str,
    cells: int = 405,
    width: int = 256,
    height: int = 128,
    spp: int = 8,
    bounces: int = 4,
):
    """Write the terrain OBJ + Lua scene; returns (lua_path, tri_count)."""
    obj_path = os.path.join(tmpdir, f"terrain_{cells}.obj")
    tris = terrain_obj(obj_path, cells)
    lua_path = os.path.join(tmpdir, f"terrain_{cells}.lua")
    with open(lua_path, "w") as fh:
        fh.write(
            TERRAIN_SCENE
            % {"w": width, "h": height, "spp": spp, "bounces": bounces, "obj": obj_path}
        )
    return lua_path, tris
