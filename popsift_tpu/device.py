"""Device introspection — the analog of popsift::cuda::device_prop_t
(/root/reference/src/popsift/common/device_prop.{h,cu}): enumerate devices,
pretty-print properties, select a device, and validate shape limits before
allocation."""

from __future__ import annotations

import sys

# The CUDA limits were 2D texture limits (device_prop.cu:95+); the TPU
# analogs are input-shape sanity and the HBM budget for the octave-0 stack
# and its derived fields.
MAX_INPUT_DIM = 1 << 15
MAX_OCTAVE0_PIXELS = 1 << 26  # 64 MPix after upscaling


class DeviceProperties:
    """device_prop_t analog."""

    def __init__(self) -> None:
        import jax
        self._devices = jax.devices()
        self._current = 0

    def set(self, n: int, print_info: bool = False) -> None:
        """Select device n (device_prop.cu:72-81)."""
        if n < 0 or n >= len(self._devices):
            raise ValueError(
                f"device {n} does not exist "
                f"({len(self._devices)} devices available)")
        self._current = n
        if print_info:
            self.print()

    def current(self):
        return self._devices[self._current]

    def print(self, file=None) -> None:
        """Pretty-printer (device_prop.cu:40-70)."""
        file = file or sys.stdout
        for i, d in enumerate(self._devices):
            marker = "*" if i == self._current else " "
            mem = getattr(d, "memory_stats", lambda: None)()
            mem_str = ""
            if mem:
                lim = mem.get("bytes_limit")
                if lim:
                    mem_str = f" hbm={lim / 2 ** 30:.1f}GiB"
            print(f"{marker} device {d.id}: {d.device_kind} "
                  f"platform={d.platform} process={d.process_index}"
                  f"{mem_str}", file=file)

    # limit validators (checkLimit_* analogs, device_prop.h:58-106)
    def check_limit_input(self, w: int, h: int, warn: bool = True) -> bool:
        ok = w <= MAX_INPUT_DIM and h <= MAX_INPUT_DIM
        if not ok and warn:
            print(f"Input size {w}x{h} exceeds the supported maximum "
                  f"dimension {MAX_INPUT_DIM}", file=sys.stderr)
        return ok

    def check_limit_scaled(self, w: int, h: int, depth: int,
                           warn: bool = True) -> bool:
        ok = w * h <= MAX_OCTAVE0_PIXELS
        if not ok and warn:
            print(f"Scaled octave 0 ({w}x{h}x{depth}) exceeds the "
                  f"device memory budget; increase downsampling",
                  file=sys.stderr)
        return ok
