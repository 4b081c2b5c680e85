"""arvae_tpu — a TPU-native framework for attribute-regularized VAEs.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
ashispati/ar-vae (Pati & Lerch, "Attribute-based Regularization of
Latent Spaces for Variational Auto-Encoders", NCAA 2020).

Layer map (mirrors SURVEY.md §1 of the reference, re-designed TPU-first):

- ``arvae_tpu.core``      — configs, run-naming, checkpointing (orbax).
- ``arvae_tpu.parallel``  — device mesh + sharding (data parallelism over ICI).
- ``arvae_tpu.ops``       — loss library incl. the fused Pallas AR-reg kernel.
- ``arvae_tpu.models``    — Flax model families (image VAE, measure VAE, fader).
- ``arvae_tpu.data``      — host-side dataset builders + attribute extractors.
- ``arvae_tpu.training``  — jitted train steps + epoch drivers.
- ``arvae_tpu.eval``      — disentanglement metric suite (host, sklearn).
- ``arvae_tpu.utils``     — plotting / artifact generation / MIDI IO.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles of the conv VAEs cost
# minutes on this toolchain; cache them across processes.
import os as _os

def _host_fingerprint() -> str:
    """Short hash of this host's CPU identity (arch + feature flags).

    XLA:CPU caches AOT-compiled machine code whose cache key does NOT
    include machine features, so a shared cache dir reused from another
    machine loads foreign artifacts with ``cpu_aot_loader``
    machine-feature-mismatch errors ("could lead to execution errors
    such as SIGILL" — MULTICHIP_r03 tail). Scoping the dir per host
    keeps same-machine reuse (the part that matters: ~0.4 s per utility
    jit through this backend's compile RPC) while making cross-machine
    artifacts invisible. TPU executables are machine-independent, but a
    fresh dir on a new host merely re-fills the cache once.
    """
    import hashlib
    import platform as _platform

    ident = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    ident += line
                    break
    except OSError:
        pass
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


if not _os.environ.get("ARVAE_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~/.cache/arvae_jax_cache"), _host_fingerprint()
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Cache EVERYTHING: on this backend even trivial utility jits
        # (threefry_split, convert_element_type, ...) cost ~0.4 s each
        # through the compile RPC, and a CLI start dispatches dozens of
        # them — they, not the big train-step HLO, dominated the ~80 s
        # first-epoch latency. With a 0 s threshold the second run's
        # startup compiles become ~50 ms cache reads.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these options
        pass
    try:
        # Belt and braces for the same SIGILL hazard: keep only the
        # jax-level executable cache; XLA's internal sub-caches (the
        # cpu_aot_loader source) stay off.
        _jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass
