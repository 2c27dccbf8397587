from nphm_tpu.parallel.mesh import get_device_mesh, batch_sharding, replicated_sharding

__all__ = ["get_device_mesh", "batch_sharding", "replicated_sharding"]
