"""Render small demo artifacts for round-1 feature additions."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.models import film as fm
from raytracingproject_tpu.utils import image_io


def main():
    out = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    # AO pass over the cornell box
    scene = examples.cornell_box(256, 256, spp=16)
    scene.integrator.set("ao_distance", 400.0)
    scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_AO])
    sess = Session(scene, SessionParams(samples=16))
    sess.reset()
    sess.render()
    ao = sess.buffers.get_pass_rect(fm.PASS_AO)
    img = np.clip(ao, 0, 1)[::-1]
    image_io.write_png(out / "ao_pass.png",
                       np.concatenate([img, np.ones_like(img[..., :1])],
                                      -1), srgb=True)
    print("ao_pass.png done")

    # mist pass
    scene2 = examples.cornell_box(256, 256, spp=4)
    scene2.film.set("mist_depth", 1600.0)
    scene2.film.set_passes([fm.PASS_COMBINED, fm.PASS_MIST])
    s2 = Session(scene2, SessionParams(samples=4))
    s2.reset()
    s2.render()
    mist = s2.buffers.get_pass_rect(fm.PASS_MIST)
    m = np.clip(np.repeat(mist, 3, axis=-1), 0, 1)[::-1]
    image_io.write_png(out / "mist_pass.png",
                       np.concatenate([m, np.ones_like(m[..., :1])], -1),
                       srgb=True)
    print("mist_pass.png done")


if __name__ == "__main__":
    main()
