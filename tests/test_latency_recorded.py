"""Pins the recorded serving-latency table (benchmarks/LATENCY.json,
measured by benchmarks/latency.py on the real chip).

Invariants the serving story rests on — if a re-measure breaks one,
the table (or the harness) regressed:
- pipelined per-window latency strictly improves with clip batch
  (batching is the throughput lever, RESULTS.md MFU table);
- isolated-request latency is ordered p50 <= p90 <= p99 and every
  percentile exceeds the pipelined floor (an isolated call can never
  beat steady state — it pays dispatch + the host-boundary RTT);
- the recorded tunnel RTT actually explains the isolated floor:
  p50 >= rtt (each isolated sample crosses the tunnel once);
- throughput and pipelined latency agree: fps ~= B*T / (B * pipelined)
  = T / pipelined.
"""

import json
import os


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'LATENCY.json')
    with open(path) as f:
        return json.load(f)


def test_latency_recorded_invariants():
    data = _load()
    rows = sorted(data['rows'], key=lambda r: r['batch'])
    assert len(rows) >= 3
    rtt = data['tunnel_rtt_ms']
    assert rtt > 0

    pipelined = [r['pipelined_ms_per_window'] for r in rows]
    assert pipelined == sorted(pipelined, reverse=True), \
        'pipelined per-window latency must improve with batch'

    for r in rows:
        iso = r['isolated_ms']
        assert iso['p50'] <= iso['p90'] <= iso['p99']
        assert iso['p50'] > r['pipelined_ms_per_window']
        assert iso['p50'] >= rtt, \
            'isolated call cannot beat one tunnel round trip'
        # fps consistency with the pipelined rate (same measurement)
        implied = r['t'] / (r['pipelined_ms_per_window'] / 1e3)
        assert abs(implied - r['fps']) / r['fps'] < 0.02
