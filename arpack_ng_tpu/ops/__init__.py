"""arpack_ng_tpu.ops subpackage."""
