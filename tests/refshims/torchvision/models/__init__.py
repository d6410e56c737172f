"""`from torchvision import models` appears in diffusion_latent.py:15 but no
torchvision model is ever constructed on the paths we execute — an empty
module satisfies the import."""
