from .texture_array import TextureArrayBuilder, TextureArray
