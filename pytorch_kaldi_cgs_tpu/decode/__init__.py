from .scoring import levenshtein, score_sequences, read_phone_map
from .viterbi import PhoneLoopHMM, viterbi_decode, batched_viterbi_decode
from .decode_dnn import decode_dnn, decode_dnn_sweep, best_wer
