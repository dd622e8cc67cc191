"""Pure-numpy per-series numerical kernels.

These are the numerical heart of the engine. Each kernel operates on one
series (a 1-D float64 array, typically one Arrow list cell = one row of the
``series`` table) and is called from inside Ray Data ``map_batches`` stages.
They reproduce the numerical semantics of the reference library
(matrix-profile-foundation/matrixprofile) without any Cython/OpenMP: scale
comes from series-level data parallelism across the cluster, not threads.
"""

from matrixprofile_ray.core.moving import (
    moving_avg_std,
    moving_average,
    moving_max,
    moving_median,
    moving_min,
    moving_std,
    muinvn,
    rolling_window,
)
from matrixprofile_ray.core.mathutil import (
    apply_exclusion_zone,
    clean_nan_inf,
    distance_profile,
    fft_convolve,
    find_skip_locations,
    pearson_to_euclidean,
    sliding_dot_product,
)
from matrixprofile_ray.core.mpx import mpx, mpx_ab, mpx_partial
from matrixprofile_ray.core.mass2 import mass2
from matrixprofile_ray.core.stomp import stomp
from matrixprofile_ray.core.mstomp import mstomp
from matrixprofile_ray.core.cluster import (
    fcluster,
    hierarchical_clusters,
    linkage,
    pairwise_dist,
)
from matrixprofile_ray.core.stampi import (
    stampi_init,
    stampi_append,
    stampi_append_many,
)
from matrixprofile_ray.core.scrimp import prescrimp, scrimp_plus_plus
from matrixprofile_ray.core.mpdist import (
    calculate_mpdist,
    mass_distance_matrix,
    mpdist,
    mpdist_vector,
)
from matrixprofile_ray.core.skimp import binary_split, maximum_subsequence, skimp
from matrixprofile_ray.core.statistics import statistics
from matrixprofile_ray.core.sax import paa, sax_symbols, sax_symbols_exact
from matrixprofile_ray.core.chains import (
    all_chain_set,
    chain_links,
    unanchored_chain,
)
from matrixprofile_ray.core.tsops import (
    acf,
    cusum_alarms,
    ewma,
    exact_mu_sigma,
    holt,
    lttb_indices,
    ols_trend,
)
from matrixprofile_ray.core.preprocess import (
    add_noise_to_series,
    impute_missing,
    is_subsequence_constant,
    preprocess,
)
from matrixprofile_ray.core.discover import (
    extract_regimes,
    fluss,
    snippets,
    top_k_discords,
    top_k_motifs,
    pmp_top_k_discords,
    pmp_top_k_motifs,
)
from matrixprofile_ray.core.transform import apply_av, empty_mp
from matrixprofile_ray.core.gorilla import (
    gorilla_decode_floats,
    gorilla_encode_floats,
    timestamps_decode,
    timestamps_encode,
)

__all__ = [name for name in dir() if not name.startswith("_")]
