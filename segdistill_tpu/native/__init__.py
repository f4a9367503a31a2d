from .fastaug import FastAugBatch, load_fastaug, fastaug_available

__all__ = ['FastAugBatch', 'load_fastaug', 'fastaug_available']
