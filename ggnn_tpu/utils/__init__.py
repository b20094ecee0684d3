from ggnn_tpu.utils.constants import SMALL_NUMBER, CHEMICAL_ACCURACIES
from ggnn_tpu.utils.init import glorot_init, zeros_init
from ggnn_tpu.utils.prefetch import ThreadedIterator
from ggnn_tpu.utils.padding import pad_to, round_up
