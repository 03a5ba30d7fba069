"""Write manifests, lineage metrics, and resumable checkpoints.

The reference's File descriptors + create_package/create_posm_bundle
(reference __init__.py:22-44, package.py) become manifest rows; its
single-transaction commit becomes Spark's atomic directory commit plus
driver-side done-markers that make the export resumable at
(format, theme) granularity — re-running an export skips parts whose
done-marker exists (BASELINE.json north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Within one part, per-partition atomicity/retry is Spark's task commit
protocol; the marker is only written after the job-level commit
succeeds, so a crash mid-write never records a done part."""

from __future__ import annotations

import json
import os


class ExportManifest:
    def __init__(self, out_dir):
        self.out_dir = out_dir
        self.entries = []
        self.metrics = {}
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(self._ckpt_dir(), exist_ok=True)

    def _ckpt_dir(self):
        return os.path.join(self.out_dir, "_checkpoints")

    def _marker(self, part_key):
        return os.path.join(self._ckpt_dir(), part_key.replace("/", "__") + ".done")

    def is_done(self, part_key) -> bool:
        return os.path.exists(self._marker(part_key))

    def mark_done(self, part_key, **info):
        with open(self._marker(part_key), "w") as f:
            json.dump(info, f)

    def add(self, **info):
        self.entries.append(info)

    def add_metric(self, name, value):
        self.metrics[name] = value

    def load_done_entries(self):
        """Recover manifest entries of already-done parts on resume."""
        for fn in sorted(os.listdir(self._ckpt_dir())):
            if fn.endswith(".done"):
                with open(os.path.join(self._ckpt_dir(), fn)) as f:
                    info = json.load(f)
                if info and "format" in info:
                    self.entries.append(info)

    def write(self):
        payload = {"entries": self.entries, "metrics": self.metrics}
        with open(os.path.join(self.out_dir, "manifest.json"), "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        return payload
