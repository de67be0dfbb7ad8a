"""arpack_ng_tpu.parallel subpackage."""
