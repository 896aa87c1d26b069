"""Device kernels.  Importing this package enables JAX's persistent
compilation cache (first compile of each scan/design shape is expensive on
remote-compile setups; subsequent processes reuse the cached executable).
Set MPTPU_NO_JAX_CACHE=1 to opt out."""

import os


def _enable_compilation_cache():
    if os.environ.get("MPTPU_NO_JAX_CACHE"):
        return
    try:
        import jax
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "multiprime_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
