"""pathtracer_tpu — a TPU-native differentiable Monte-Carlo path tracer.

Umbrella API (the analog of ``/root/reference/pathtracer/pathtracer.h``,
which re-exports bvh/camera/linalg/material/render/triangle).  Typical use:

    import pathtracer_tpu as pt
    cam, scene = pt.cornell_box(res=(512, 512))
    film = pt.render(cam, scene, samples=256, depth=5, filename="out.png")

Subsystem map (SURVEY.md section 2 inventory -> modules):
    linalg, rng                 L1 math/RNG primitives
    scene, camera, materials    L2 scene (SoA triangles, pinhole camera, BRDFs)
    bvh                         L2 acceleration (host SAH build, flat arrays)
    ops.intersect, ops.trace    device intersection + bounce loop
    ops.wavefront, ops.pallas   wavefront pipeline and Pallas TPU kernels
    image                       L3b film + PNG/PPM I/O
    render                      L4 drivers
    realtime                    progressive-accumulation viewer state machine
    diff, inverse               differentiable rendering + inverse rendering
    parallel                    multi-chip sharding (mesh, shard_map, psum)
    obj_loader                  OBJ/MTL scene import
    utils                       timer, profiling, checkpointing, native libs
"""

import os as _os

import jax as _jax

# Persistent XLA/Mosaic compile cache: first-compile of the fused kernels is
# expensive (minutes through the remote-compile tunnel); cache survives
# process restarts.  Respect an explicit user setting.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.join(
        _os.environ.get("HOME", "/tmp"), ".cache", "pathtracer_tpu_jax")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .linalg import DEG2RAD, EPS, FLOAT_INF, SHIFT_BIAS, color  # noqa: F401
from .camera import (  # noqa: F401
    Camera, make_camera, get_rays, rotate, move,
    FORWARD, BACKWARD, LEFT, RIGHT, UP, DOWN,
)
from .materials import EMIT, DIFFUSE, SPECULAR  # noqa: F401
from .scene import (  # noqa: F401
    Scene, SceneBuilder, HostMaterial, Diffuse, Emit, Specular,
    cornell_box, modified_cornell, corner_scene,
)
from .bvh import FlatBVH, build_bvh, print_tree  # noqa: F401
from .clusters import (BeamAccel, ClusterSet, build_beam_accel,  # noqa: F401
                       build_clusters)
from .image import Film, psnr, read_png, write_png  # noqa: F401
from .render import render, render_film  # noqa: F401
from .obj_loader import load_obj, load_obj_scene  # noqa: F401
from .realtime import RealtimeSession, render_realtime  # noqa: F401
from .utils.timer import Timer  # noqa: F401

__version__ = "0.1.0"
