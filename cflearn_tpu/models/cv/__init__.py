from . import ae, diffusion, gan, vae
