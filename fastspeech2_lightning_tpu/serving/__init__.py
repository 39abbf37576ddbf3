"""Serving: resident batch-streaming synthesis server.

Beyond-reference feature (the reference's serving story is `fs2l synthesize`
one-shot CLI runs, fs2/cli/synthesize.py:466-695). Here a resident process
keeps the model + vocoder loaded and jitted once, micro-batches chunk
requests across connections onto fixed-shape device batches, and streams
each utterance's audio back chunk-by-chunk while later chunks are still
being synthesized.
"""

from .server import SynthesisServer, serve

__all__ = ["SynthesisServer", "serve"]
