"""Single-image encode CLI without the video orchestration
(reference: coolchic/encode_simpler.py — same warmup/train/quantize phases
as encode.py, minus the VideoEncoder loops).

In this rebuild the single-image path *is* the primary pipeline, so this
module simply exposes it under the reference's entry-point name:

    python -m coolchic_tpu.encode_simpler --input=img.png --output=img.cool
"""

import sys

from coolchic_tpu.encode import main

if __name__ == "__main__":
    sys.exit(main())
