class Model:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("keras models shim: models are not executable")
