from coslam_tpu.utils import geometry, camera  # noqa: F401
