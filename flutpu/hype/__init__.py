"""flutpu.hype — GOP-chunk parallel encoder (HYbrid Parallel Encoder).

The framework's data-parallelism engine, rebuilt from the reference's hype
Rust plugin: fixed-GOP chunk boundaries (scenedetector), round-robin scatter
with per-branch queues and forced keyframes (outputselector), and strictly
ordered N→1 reassembly (scenecollector), composed in the ``hype`` bin.

On TPU the same contract scales past threads: ``flutpu.hype.tpu`` runs the
per-chunk encode loop one-chunk-per-chip over a jax.sharding.Mesh.
"""

from .events import SceneNewEvent, SCENE_NEW_EVENT_NAME
from .scenedetector import SceneDetector
from .outputselector import OutputSelector
from .scenecollector import SceneCollector
from .hypebin import Hype
from .tpu import TpuHype

__all__ = ["SceneNewEvent", "SCENE_NEW_EVENT_NAME", "SceneDetector",
           "OutputSelector", "SceneCollector", "Hype", "TpuHype"]
