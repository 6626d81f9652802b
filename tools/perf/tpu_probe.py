"""TPU (axon tunnel) health probe.

The tunneled backend occasionally becomes unreachable for extended
periods (observed: >2 h). Symptom: any TPU process sits at ~0 CPU
seconds forever after printing only the "Platform 'axon' is
experimental" warning. This probe bounds the check; run it before
launching long TPU jobs, and wait out outages with CPU-side work
(tests force CPU via conftest).

  timeout 120 python tools/perf/tpu_probe.py && echo UP || echo DOWN

A process stuck PRE-backend (no compile/op ever started) is safe to
kill by PID; only killing mid-op risks poisoning the backend for
followers (CLAUDE.md).
"""

import jax

devs = jax.devices()
print(devs)
assert devs, "no devices"
