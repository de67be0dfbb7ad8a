"""arpack_ng_tpu.core subpackage."""
