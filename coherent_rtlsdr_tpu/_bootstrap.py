"""jax-free bootstrap helpers (must be importable BEFORE jax initializes)."""

import os


def force_virtual_devices(n: int) -> None:
    """Make the CPU backend expose ``n`` virtual devices (for --mesh on
    --cpu). MUST run before jax is imported — XLA reads the flag once at
    backend init. No-op when a device-count flag is already set."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={int(n)}"
        )
