"""bronko-tpu: a TPU-native, mapping-free viral variant caller.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
treangenlab/bronko: reference genomes are k-merized into a
locality-collapsing bucket index; reads are k-mer counted and probed against
the index on-device; matched k-mers scatter into strand-aware pileup tensors;
a vectorized statistical caller emits VCFs of major variants and iSNVs.

Importing this package enables JAX x64 mode (the k-mer/bucket word size is
64-bit). Do it before creating any JAX arrays.
"""

from bronko_tpu.consts import BRONKO_TPU_VERSION as __version__  # noqa: F401


def _configure_jax() -> None:
    import os

    try:
        import jax

        jax.config.update("jax_enable_x64", True)
        # BRONKO_PLATFORM=cpu|tpu|axon overrides the ambient platform choice
        # (container sitecustomize may pin an experimental TPU plugin).
        platform = os.environ.get("BRONKO_PLATFORM")
        if platform:
            jax.config.update("jax_platforms", platform)
        # persistent compilation cache: TPU compiles may go through a slow
        # remote tunnel; cache them across processes
        cache_dir = os.environ.get(
            "BRONKO_JAX_CACHE", os.path.expanduser("~/.cache/bronko_jax")
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # older jax without these flags
            pass
    except ImportError:  # pure host-side use (oracle, IO) works without jax
        pass


_configure_jax()
