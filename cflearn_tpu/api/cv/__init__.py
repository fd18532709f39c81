from .translator import TranslatorAPI
