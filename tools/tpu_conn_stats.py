"""Measure connection-slot sparsity at dragon scale: per-lane connectable
counts after the lamp trace vs the compacted K' (max) the deferred chunks
sweep. The ragged-packing win factor is ~K'/mean."""
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from tools.synthetic import dragon_scene
from pyrite_tpu.project import load_project
from pyrite_tpu.scene import CameraModel, build_scene
from pyrite_tpu.film import Film
from pyrite_tpu.tracer import TraceConfig
import pyrite_tpu.renderers.bidirectional as B


def main():
    lb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    lua, tris = dragon_scene(tempfile.mkdtemp(), cells=660, light_bounces=lb)
    pd = load_project(lua)
    scene = build_scene(pd)
    settings = pd.project.renderer
    film = Film(width=pd.project.image.width, height=pd.project.image.height,
                bins=settings.spectrum_bins, span=settings.spectrum_span)
    camera = CameraModel.from_ir(pd.project.camera)
    cfg = TraceConfig(bounces=settings.bounces,
                      light_samples=settings.light_samples,
                      spectrum_samples=settings.spectrum_samples)
    rows = B.pick_rows_per_chunk(film, lb, settings.spectrum_samples,
                                 scene=scene, bounces=settings.bounces)
    pix = rows * film.width
    st = B.make_regen_bdpt_steps(scene, film, camera, cfg, lb, rows, rounds=2)
    data = scene.device_data()
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    conn, wl, count = st["lamp"](jax.random.fold_in(key, 1009), data, jnp.int32(0))
    counts = np.asarray(jnp.sum(conn["conn_ok"].astype(jnp.int32), axis=1))
    lengths = np.asarray(conn["length"])
    print(f"tris={tris} lb={lb} pix={pix} t={time.time()-t0:.1f}s")
    print(f"connectable per lane: mean={counts.mean():.2f} p50={np.percentile(counts,50):.0f} "
          f"p95={np.percentile(counts,95):.0f} p99={np.percentile(counts,99):.0f} max={counts.max()}")
    print(f"lamp length: mean={lengths.mean():.2f} p95={np.percentile(lengths,95):.0f} max={lengths.max()}")
    print(f"current K' bucketing (pow2 >= max): {int(count)} -> sweep waste factor ~ "
          f"{max(1,int(count))/max(counts.mean(),1e-9):.1f}x vs mean")


if __name__ == "__main__":
    main()
