from tpu_euler.utils.runtime import setup_compilation_cache  # noqa: F401
