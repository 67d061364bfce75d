"""Checkpoint/resume manifests and broadcast helpers."""

from nmr_fair_dos_ray.state.manifest import Manifest, atomic_write_bytes, fingerprint_files  # noqa: F401
