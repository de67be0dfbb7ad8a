"""arpack_ng_tpu.io subpackage."""
