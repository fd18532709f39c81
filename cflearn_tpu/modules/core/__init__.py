from . import activations, attentions, convs, customs, high_level, mappings, mixed_stacks, ml_encoder, norms
