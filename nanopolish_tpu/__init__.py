"""nanopolish_tpu — a TPU-native framework for signal-level nanopore analysis.

A from-scratch rebuild of the capabilities of jts/nanopolish, designed for
TPU hardware: dense batched HBM arrays, JAX/XLA/Pallas compute kernels for
the banded-DP / profile-HMM numerical core, `jax.sharding` data parallelism
over device meshes, and native host-side I/O.

Subcommands (CLI parity with the reference binary):
  index, eventalign, variants, methyltrain, scorereads, phase-reads,
  vcf2fasta, polya, detect-polyi, fast5-check, call-methylation.
"""

__version__ = "0.1.0"

import os as _os

# The DP kernels compile slowly (remote-attached TPUs compile out of
# process); cache executables across runs unless the user configured
# their own cache.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/npt_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from .utils.alphabet import (  # noqa: F401
    ALPHABETS,
    DNA_ALPHABET,
    METHYL_CPG_ALPHABET,
    METHYL_DAM_ALPHABET,
    METHYL_DCM_ALPHABET,
    METHYL_GPC_ALPHABET,
    U_TO_T_RNA_ALPHABET,
    Alphabet,
    get_alphabet_by_name,
)
from .models.pore_model import PoreModel, PoreModelSet, get_model  # noqa: F401
