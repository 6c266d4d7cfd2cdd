"""Test harness bootstrap: force the virtual 8-device CPU mesh.

The execution image registers a hardware backend at interpreter startup
(sitecustomize), BEFORE conftest or any package code runs — in-process env
changes cannot redirect jax afterwards. So if this process came up bound to
hardware, re-exec pytest once with the env that (a) skips the hardware
registration and (b) forces 8 virtual CPU devices, making multi-chip
sharding paths testable without a pod slice (SURVEY.md §4).
"""
import os
import sys

_MARK = "TIG_TESTS_REEXEC"

if os.environ.get(_MARK) != "1":
    env = dict(
        os.environ,
        **{
            _MARK: "1",
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            # --xla_cpu_use_fusion_emitters=false: jaxlib 0.9.0's CPU
            # fusion-emitter codegen produces kernels that never terminate
            # for our op mix (two tf_XLAEigen threads spin forever on a
            # ~150-op quat chain); the classic emitters run it in ~1 ms.
            "XLA_FLAGS": (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
                + " --xla_cpu_use_fusion_emitters=false"
            ).strip(),
        },
    )
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

import jax  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-bound on XLA:CPU (~9 min
# cold); cached reruns finish in ~2 min
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
