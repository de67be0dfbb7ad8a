"""arpack_ng_tpu.utils subpackage."""
