from .frontend import BOS_ID, EOS_ID, PAD_ID, UNK_ID, FrontEnd, LinguisticFeature, pick_bucket
