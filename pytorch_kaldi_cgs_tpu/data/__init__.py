from . import kaldi_io
from . import features
from . import dataset
from . import synth
