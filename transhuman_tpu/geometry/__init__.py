from . import cameras, clusters, rays, smpl  # noqa: F401
