"""pacbioassembly_tpu — a TPU-native long-read assembly engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
C++ project vmingchen/PacBioAssembly (see SURVEY.md): 2-bit DNA codec and
binary sequence files, spaced-seed indexing of an evolving consensus
reference, banded edit-distance alignment with traceback and end extension,
and per-base voting consensus that iteratively corrects and grows the
reference from noisy PacBio long reads.

Layers (bottom to top):
  codec/      2-bit DNA packing, record files       (ref: src/dna_seq.h)
  align/      banded edit-distance DP               (ref: src/seq_aligner.h)
  index/      spaced-seed sorted-table index        (ref: src/ref_seq.h get_seedmap)
  consensus/  vote tensors, elect/evolve, growth    (ref: src/ref_seq.h)
  assemble/   round driver, exact + batch engines   (ref: src/spaced_seed.cpp)
  parallel/   device mesh, shard_map screening, psum vote merge (new; the
              reference is single-threaded)
  native/     C++ host core: aligner + record IO (ctypes)
  tools/      CLI parity: convert/assemble/locate/visualize/quality/stat-hash
"""

__version__ = "0.1.0"

from .config import AssemblyConfig, Constants

__all__ = ["AssemblyConfig", "Constants", "__version__"]
