"""Single-core stage profile of process_page on the REAL bench corpus
pages (synth_corpus of $SPARK_GRAFT_SF_DIR), not the stylized micro
corpus — the micro profile said 8 ms/page while the cluster run costs
14+ ms/page, so measure what the bench actually decodes."""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def main() -> None:
    from ocr_inference_spark.model import get_session, serialize_weights
    from ocr_inference_spark.session import get_spark
    from ocr_inference_spark.synth import synth_corpus

    spark = get_spark(app_name="profile_ocr_real", master="local[8]")
    docs, pages, _ = synth_corpus(spark, SF_DIR)
    sample = pages.limit(N).collect()
    print(f"sampled {len(sample)} pages")
    spark.stop()

    session = get_session(serialize_weights())

    from ocr_inference_spark import page as page_mod

    # wrap the stage functions with timers
    t = defaultdict(float)

    import ocr_inference_spark.page as P

    real = {}
    for stage in ("decode_image",):
        pass

    t0 = time.perf_counter()
    for row in sample:
        P.process_page(bytes(row.content), session)
    total = time.perf_counter() - t0
    print(f"process_page total: {1000*total/len(sample):.3f} ms/page")

    # stage-level: monkeypatch timers around the internals
    import cProfile
    import pstats

    pr = cProfile.Profile()
    pr.enable()
    for row in sample:
        P.process_page(bytes(row.content), session)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(25)


if __name__ == "__main__":
    main()
