"""Algorithm configuration for the KELOS engine.

Defaults mirror the reference's compile-time constants
(reference: src/main/java/KELOS/Main.java:29-36).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class KelosConfig:
    """Parameters of the KELOS outlier-detection pipeline.

    Attributes
    ----------
    pane_seconds:
        Tumbling pane duration == slide size (``Main.java:31`` WINDOW_TIME).
    panes_per_window:
        Number of panes per sliding window (``Main.java:30``
        AGGREGATION_WINDOWS).
    distance_threshold:
        Greedy micro-cluster radius (``Main.java:32``).
    k:
        Number of nearest-neighbor clusters used for KDE (``Main.java:34``).
    n:
        Top-N outliers emitted per window (``Main.java:36``).
    """

    pane_seconds: int = 10
    panes_per_window: int = 3
    distance_threshold: float = 0.25
    k: int = 20
    n: int = 100
    # KDE kernel: 'gaussian' (reference parity, GaussianKernel.java) or
    # 'epanechnikov' (compact-support extension, core.KERNELS).
    kernel: str = "gaussian"

    def __post_init__(self):
        # fail fast on the driver — a typo'd kernel name would otherwise
        # surface as an opaque KeyError inside a pandas-UDF executor.
        # (Literal tuple mirrors core.KERNELS; kept import-free so
        # config stays a leaf module.)
        if self.kernel not in ("gaussian", "epanechnikov"):
            raise ValueError(
                f"unknown kernel {self.kernel!r}; "
                "expected 'gaussian' or 'epanechnikov' (core.KERNELS)"
            )

    @property
    def window_seconds(self) -> int:
        return self.pane_seconds * self.panes_per_window


DEFAULT_CONFIG = KelosConfig()
