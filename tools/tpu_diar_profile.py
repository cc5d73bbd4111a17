"""Stage-level wall profile of the hour-scale diarization bench path.

Reproduces bench.bench_diarization()'s synthetic hour and times each stage
of crispy_tpu.engine.diarization.diarize separately (segmentation, chunking,
embeddings, clustering, merge) so perf work targets the real hot spot.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import time

import numpy as np

from crispy_tpu.engine import diarization as dz


def synth_hour(minutes=60, sr=16000):
    from crispy_tpu.utils.synth import synth_speaker_hour

    return synth_speaker_hour(minutes, sr)  # the bench's exact fixture


def main():
    audio = synth_hour()
    # fused one-upload frontend (the path bench/diarize take for long audio)
    for rep in range(3):
        t0 = time.perf_counter()
        res = dz.diarize(audio, max_speakers=8, merge_gap=1.0)
        dt = time.perf_counter() - t0
        print(f"fused diarize rep {rep}: {dt*1e3:9.1f} ms -> "
              f"{3600/dt:.0f}x realtime ({len(res)} segs, "
              f"{len(set(s.speaker for s in res))} speakers)", flush=True)
    import os
    os.environ["CRISPY_DIAR_FUSED"] = "off"
    for rep in range(2):
        stages = {}
        t0 = time.perf_counter()
        segments = dz.segment_speech(audio, 1.0, dz.energy_vad_logits)
        stages["segment_speech"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        chunks = dz.chunk_segments(segments)
        stages["chunk_segments"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        embeddings = np.asarray(dz.melstats_embedding([c.samples for c in chunks]))
        stages["embeddings"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        labels = dz.nme_sc(embeddings, 8)
        stages["nme_sc"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        appearance = []
        for lbl in labels:
            if int(lbl) not in appearance:
                appearance.append(int(lbl))
        result = [
            dz.SpeakerSegment(c.start, c.end, f"Speaker {appearance.index(int(l)) + 1}")
            for c, l in zip(chunks, labels)
        ]
        result.sort(key=lambda s: s.start)
        merged = dz.merge_consecutive_segments(result, 1.0)
        stages["merge"] = time.perf_counter() - t0

        total = sum(stages.values())
        print(f"rep {rep}: segments={len(segments)} chunks={len(chunks)} "
              f"emb_dim={embeddings.shape} speakers={len(set(s.speaker for s in merged))}")
        for k, v in stages.items():
            print(f"  {k:16s} {v*1e3:9.1f} ms  ({100*v/total:5.1f}%)")
        print(f"  {'TOTAL':16s} {total*1e3:9.1f} ms  -> {3600/total:.0f}x realtime")


if __name__ == "__main__":
    main()
