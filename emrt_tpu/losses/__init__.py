from .cross_entropy import (CrossEntropyLoss, MixSoftmaxCrossEntropyLoss,
                            MultiCrossEntropyLoss, OhemCrossEntropyLoss,
                            get_loss_function)
