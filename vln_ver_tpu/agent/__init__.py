"""VLN agent layer: cross-modal policy over VER volumes with volume state
estimation and episodic memory.

The reference repo releases only the VER perception stack; the agent half
exists only in the paper (arXiv 2403.14158 §3.3-3.5, README abstract:
"state-of-the-art ... R2R, REVERIE, R4R").  This package designs it fresh,
TPU-first, from the paper + the DUET/HAMT lineage it cites:

* ``text``    — transformer instruction encoder
* ``ver``     — VER volume tokenizer + volume state estimation head
* ``memory``  — fixed-capacity episodic memory (topological node bank)
* ``policy``  — dual-scale (local volume / global map) cross-modal policy
* ``env``     — R2R-format episode environment (host-side graph stepping)
* ``rollout`` — teacher-forcing / sampling rollouts + SR/SPL metrics
"""

from .policy import VLNPolicy, PolicyConfig  # noqa: F401
from .memory import (EpisodicMemory, init_memory,  # noqa: F401
                     memory_from_arrays, update_memory)
