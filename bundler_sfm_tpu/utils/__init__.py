"""Shared utilities: telemetry (stage timers / counters / rates) and
profiling hooks.  Replaces the reference's ad-hoc `clock()` printfs
(SURVEY.md §5 "Tracing / profiling": `src/BundleFast.cpp:39,440-443`,
`src/Bundle.cpp:643-657`, `src/KeyMatchFull.cpp:101-103,145-147`) with one
structured registry."""

from bundler_sfm_tpu.utils.telemetry import (  # noqa: F401
    Telemetry, get_telemetry, stage, counter, rate_report, trace,
)
