"""Verify drive: end-to-end dup-scan through the public API (see .claude/skills/verify)."""
import numpy as np, tempfile
from pathlib import Path
from PIL import Image

tmp = Path(tempfile.mkdtemp())
rng = np.random.default_rng(42)
paths = []
for i in range(4):
    arr = np.kron(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), np.ones((32, 32, 1), dtype=np.uint8))
    p = tmp / f"base_{i}.png"; Image.fromarray(arr).save(p); paths.append(p)
img0 = Image.open(paths[0]).convert("RGB")
img0.save(tmp / "copy_0.jpg", quality=95)
Image.fromarray(np.clip(np.asarray(img0).astype(np.int16) + 20, 0, 255).astype(np.uint8)).save(tmp / "bright_0.png")
(tmp / "broken.jpg").write_bytes(b"\xff\xd8 nope")

from kobato_eyes_tpu.sig import compute_signatures
from kobato_eyes_tpu.dup import TpuDuplicateScanner, DuplicateFileMeta, DuplicateScanConfig
from kobato_eyes_tpu.dup.cpu_ref import CpuDuplicateScanner

all_paths = sorted(tmp.glob("*"))
batch = compute_signatures([(i, str(p)) for i, p in enumerate(all_paths)])
rows = [DuplicateFileMeta(file_id=fid, path=all_paths[fid], size=all_paths[fid].stat().st_size,
        width=256, height=256, phash=ph) for fid, ph in zip(batch.file_ids, batch.phash)]
cfg = DuplicateScanConfig(hamming_threshold=8, size_ratio=0.5)
tc = TpuDuplicateScanner(cfg).build_clusters(rows)
cc = CpuDuplicateScanner(cfg).build_clusters(rows)
def ids(cl): return sorted(tuple(sorted(e.file.file_id for e in c.files)) for c in cl)
assert ids(tc) == ids(cc), (ids(tc), ids(cc))
assert [c.keeper_id for c in tc] == [c.keeper_id for c in cc]
assert batch.failed_ids and all_paths[batch.failed_ids[0]].name == "broken.jpg"
assert any(len(c) >= 2 for c in ids(tc)), "copies should cluster"
print("clusters:", ids(tc), "failed:", batch.failed_ids)
print("VERIFY-DUP-OK")
