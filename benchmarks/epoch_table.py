"""Per-epoch loss-component table from a training run's metrics.jsonl.

The fit loop logs the jitted step's returned aux every
`log_every_steps` (training/loop.py); this collapses those step records
into per-epoch means of the YOLO loss components + recall — the
416-squared training-stability evidence table for RESULTS.md (the
reference's only analogue is a tf.Print stream nobody recorded,
KerasYOLO.py:226-233).

Usage: python benchmarks/epoch_table.py <metrics.jsonl> <steps_per_epoch>
"""

from __future__ import annotations

import json
import sys

COLS = ('loss', 'loss_xy', 'loss_wh', 'loss_conf', 'loss_class',
        'track_recall', 'detect_recall')


def epoch_table(path: str, steps_per_epoch: int):
    epochs: dict[int, list[dict]] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            # strip the fit loop's 'train/' prefix; skip val records
            rec = {k.split('/', 1)[-1]: v for k, v in rec.items()
                   if not k.startswith('val/')}
            if 'loss' not in rec:
                continue
            ep = (rec['step'] - 1) // steps_per_epoch
            epochs.setdefault(ep, []).append(rec)
    rows = []
    for ep in sorted(epochs):
        recs = epochs[ep]
        row = {'epoch': ep + 1, 'steps': len(recs)}
        for c in COLS:
            vals = [r[c] for r in recs if c in r]
            if vals:
                row[c] = sum(vals) / len(vals)
        rows.append(row)
    return rows


def main():
    path = sys.argv[1]
    spe = int(sys.argv[2])
    rows = epoch_table(path, spe)
    print('| epoch | loss | loss_xy | loss_wh | loss_conf | loss_class '
          '| track recall | detect recall |')
    print('|---|---|---|---|---|---|---|---|')
    for r in rows:
        print(f"| {r['epoch']} | {r.get('loss', float('nan')):.3f} | "
              f"{r.get('loss_xy', float('nan')):.3f} | "
              f"{r.get('loss_wh', float('nan')):.3f} | "
              f"{r.get('loss_conf', float('nan')):.3f} | "
              f"{r.get('loss_class', float('nan')):.3f} | "
              f"{r.get('track_recall', float('nan')):.3f} | "
              f"{r.get('detect_recall', float('nan')):.3f} |")


if __name__ == '__main__':
    main()
