"""Model zoo tests: shapes, latent-length arithmetic, factory filtering,
param counting — structure parity with the reference architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decode_tonal_langauge_tpu.models import (
    CNNClassifier,
    CNNRNNClassifier,
    LogisticRegressionClassifier,
    ShallowNNClassifier,
    SynthesisLite,
    SynthesisModelCNN,
    get_classifier_by_name,
)
from decode_tonal_langauge_tpu.models.base import (
    count_params,
    layer_param_counts,
)
from decode_tonal_langauge_tpu.models.deep import cnn_latent_length
from decode_tonal_langauge_tpu.models.synthesis import synthesis_cnn_latent_length


def _init_apply(model, *args, train=False):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, *args, train=train)
    out = model.apply(
        variables, *args, train=train,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return out, variables


class TestSimple:
    def test_logistic_shapes_and_params(self):
        model = LogisticRegressionClassifier(input_dim=40, n_classes=3)
        x = jnp.ones((5, 4, 10))
        out, variables = _init_apply(model, x)
        assert out.shape == (5, 3)
        # weights 40*3 + bias 3
        assert count_params(variables["params"]) == 123

    def test_logistic_input_validation(self):
        model = LogisticRegressionClassifier(input_dim=10, n_classes=2)
        with pytest.raises(ValueError, match="Expected input dimension"):
            model.init(jax.random.key(0), jnp.ones((2, 7)))

    def test_min_classes(self):
        with pytest.raises(ValueError, match="at least 2"):
            LogisticRegressionClassifier(input_dim=4, n_classes=1).init(
                jax.random.key(0), jnp.ones((1, 4))
            )

    def test_shallow_default_hidden(self):
        model = ShallowNNClassifier(input_dim=40, n_classes=4)
        out, variables = _init_apply(model, jnp.ones((2, 40)))
        assert out.shape == (2, 4)
        counts = layer_param_counts(variables)
        assert counts["hidden"] == 40 * 20 + 20  # hidden = input_dim // 2

    def test_shallow_activation_dispatch(self):
        for act in ["ELU", "ReLU", "LeakyReLU", "GELU"]:
            model = ShallowNNClassifier(
                input_dim=8, n_classes=2, hidden_dim=4, activation=act
            )
            out, _ = _init_apply(model, jnp.ones((1, 8)))
            assert out.shape == (1, 2)

    def test_unknown_activation(self):
        with pytest.raises(ValueError, match="Unsupported activation"):
            ShallowNNClassifier(
                input_dim=8, n_classes=2, activation="Swishy"
            ).init(jax.random.key(0), jnp.ones((1, 8)))


class TestDeep:
    def test_cnn_latent_length_formula(self):
        # torch-walk oracle: conv k3 (T-2), pool (T//2), x4; conv k3; conv k3; pool
        def oracle(t):
            for _ in range(4):
                t = t - 2
                t = (t - 2) // 2 + 1
            t = t - 2
            t = t - 2
            t = (t - 2) // 2 + 1
            return t

        for t in [200, 250, 300, 400]:
            assert cnn_latent_length(t) == oracle(t)

    def test_cnn_classifier_forward(self):
        model = CNNClassifier(input_channels=4, input_length=200, n_classes=2)
        x = jnp.ones((2, 4, 200))
        out, variables = _init_apply(model, x)
        assert out.shape == (2, 2)
        assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))  # sigmoid
        # head input = 256 * C * latent_length
        lat = cnn_latent_length(200)
        counts = layer_param_counts(variables)
        assert counts["fc1"] == 256 * 4 * lat * 1024 + 1024

    def test_cnn_rejects_short_input(self):
        with pytest.raises(ValueError, match="too small"):
            CNNClassifier(input_channels=2, input_length=20, n_classes=2).init(
                {"params": jax.random.key(0)}, jnp.ones((1, 2, 20))
            )

    def test_cnnrnn_forward(self):
        model = CNNRNNClassifier(
            input_channels=3, input_length=100, n_classes=4, lstm_dim=800
        )
        x = jnp.ones((2, 3, 100))
        out, _ = _init_apply(model, x)
        assert out.shape == (2, 4)
        assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))

    def test_cnnrnn_divisibility_check(self):
        with pytest.raises(ValueError, match="divisible"):
            CNNRNNClassifier(
                input_channels=3, input_length=99, n_classes=4, lstm_dim=800
            ).init({"params": jax.random.key(0)}, jnp.ones((1, 3, 99)))


class TestSynthesis:
    def test_latent_length_formula(self):
        def oracle(t):
            for _ in range(3):
                t = t - 2
                t = (t - 2) // 2 + 1
            # k=1 conv, then pool, then k=1 conv
            t = (t - 2) // 2 + 1
            return t

        for t in [200, 160, 300]:
            assert synthesis_cnn_latent_length(t) == oracle(t)

    def test_synthesis_cnn_forward(self):
        model = SynthesisModelCNN(
            output_dim=96, n_channels=3, n_timepoints=160,
            lstm_channels=2, conv_channels=8,
        )
        ecog = jnp.ones((2, 3, 160))
        labels = jnp.ones((2, 2, 5))
        out, _ = _init_apply(model, ecog, labels)
        assert out.shape == (2, 96)

    def test_synthesis_lite_forward_and_bn(self):
        model = SynthesisLite(output_dim=64, n_channels=4, n_timepoints=100)
        ecog = jnp.ones((2, 4, 100))
        labels = jnp.ones((2, 2, 5))
        out, variables = _init_apply(model, ecog, labels, train=True)
        assert out.shape == (2, 64)
        assert "batch_stats" in variables


class TestFactory:
    def test_reference_paths_resolve(self):
        model = get_classifier_by_name(
            "models.simple_classifiers.LogisticRegressionClassifier",
            n_classes=3, n_channels=4, seq_length=10,
        )
        assert isinstance(model, LogisticRegressionClassifier)
        assert model.input_dim == 40

    def test_kwarg_filtering(self):
        # CNNClassifier takes input_channels/input_length but not input_dim
        model = get_classifier_by_name(
            "decode_tonal_langauge_tpu.models.deep.CNNClassifier",
            n_classes=2, n_channels=4, seq_length=200,
            classifier_kwargs={"dropout_rate": 0.2},
        )
        assert isinstance(model, CNNClassifier)
        assert model.input_channels == 4
        assert model.dropout_rate == 0.2

    def test_user_kwargs_override(self):
        model = get_classifier_by_name(
            "models.simple_classifiers.ShallowNNClassifier",
            n_classes=2, n_channels=4, seq_length=10,
            classifier_kwargs={"hidden_dim": 7},
        )
        assert model.hidden_dim == 7


class TestComputeDtype:
    """bfloat16 compute path: MXU-native, params stay f32, output f32."""

    def test_cnn_bf16_forward_and_params(self, rng):
        model = CNNClassifier(
            input_channels=4, input_length=200, n_classes=2,
            dtype=jnp.bfloat16,
        )
        x = jnp.asarray(rng.standard_normal((2, 4, 200)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        # params are kept in f32 (master weights)
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        out = model.apply(variables, x, train=False)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_cnnrnn_bf16_forward(self, rng):
        model = CNNRNNClassifier(
            input_channels=4, input_length=200, n_classes=4,
            lstm_dim=800, dtype=jnp.bfloat16,
        )
        x = jnp.asarray(rng.standard_normal((2, 4, 200)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 4) and out.dtype == jnp.float32

    def test_factory_coerces_dtype_string(self):
        model = get_classifier_by_name(
            "models.deep_classifiers.CNNClassifier",
            n_classes=2, n_channels=4, seq_length=200,
            classifier_kwargs={"dtype": "bfloat16"},
        )
        assert model.dtype == jnp.bfloat16

    def test_bf16_class_head_has_f32_resolution(self, rng):
        """The sigmoid head must compute in f32 even when dtype=bfloat16.

        Regression: a bf16 head quantizes the logits to bf16's ~2^-8
        grid, and on trained models the sigmoid outputs produced EXACT
        top-2 ties (9/20 test trials measured) — argmax then flips
        between differently-compiled forwards, so the evaluation stage
        disagreed with the training stage on the same checkpoint. With
        the f32 head, outputs must NOT all sit on the bf16 grid."""
        for model in (
            CNNClassifier(
                input_channels=4, input_length=200, n_classes=4,
                dtype=jnp.bfloat16,
            ),
            CNNRNNClassifier(
                input_channels=4, input_length=200, n_classes=4,
                lstm_dim=800, dtype=jnp.bfloat16,
            ),
        ):
            x = jnp.asarray(rng.standard_normal((4, 4, 200)).astype(np.float32))
            variables = model.init({"params": jax.random.key(0)}, x, train=False)
            out = np.asarray(model.apply(variables, x, train=False))
            on_grid = np.asarray(
                jnp.asarray(out).astype(jnp.bfloat16).astype(jnp.float32)
            )
            assert (out != on_grid).any(), (
                f"{type(model).__name__}: every output is exactly "
                "bf16-representable — the head is computing in bf16"
            )


class TestStencilConv:
    """ops/stencil.py: the fused C_in=1 first-layer conv must agree with
    the nn.Conv + max_pool + leaky_relu chain it replaced, and keep the
    exact param tree (checkpoint compatibility)."""

    def test_matches_conv_pool_leaky_oracle(self, rng):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from decode_tonal_langauge_tpu.ops.stencil import (
            stencil_conv_pool_leaky,
        )

        for K, pool, T in ((3, 2, 21), (7, 2, 40), (3, 1, 10)):
            x = jnp.asarray(
                rng.standard_normal((2, T, 5)).astype(np.float32)
            )
            kernel = jnp.asarray(
                rng.standard_normal((K, 1, 1, 8)).astype(np.float32)
            )
            bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
            ref = jax.lax.conv_general_dilated(
                x[..., None], kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            ) + bias
            if pool > 1:
                ref = nn.max_pool(
                    ref, window_shape=(pool, 1), strides=(pool, 1)
                )
            ref = nn.leaky_relu(ref, negative_slope=0.01)
            got = stencil_conv_pool_leaky(
                x, kernel, bias, pool=pool, negative_slope=0.01,
                dtype=jnp.float32,
            )
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
            )

    def test_param_tree_matches_conv(self):
        """The models' first conv block keeps the kernel/bias names and
        shapes of the nn.Conv it replaced — old checkpoints load."""
        import jax
        import jax.numpy as jnp

        from decode_tonal_langauge_tpu.models.deep import (
            CNNClassifier,
            CNNRNNClassifier,
        )
        from decode_tonal_langauge_tpu.models.synthesis import (
            SynthesisModelCNN,
        )

        cnn = CNNClassifier(input_channels=4, input_length=200, n_classes=2)
        p = cnn.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 4, 200)), train=False,
        )["params"]
        assert p["convs_0"]["kernel"].shape == (3, 1, 1, 512)
        assert p["convs_0"]["bias"].shape == (512,)

        rnn = CNNRNNClassifier(
            input_channels=4, input_length=100, n_classes=2, lstm_dim=400
        )
        p = rnn.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 4, 100)), train=False,
        )["params"]
        assert p["conv1"]["kernel"].shape == (7, 1, 1, 1024)
        assert p["conv2"]["kernel"].shape == (7, 1, 1, 1024)

        syn = SynthesisModelCNN(output_dim=64, n_channels=4, n_timepoints=100)
        p = syn.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, 4, 100)), jnp.zeros((1, 2, 10)), train=False,
        )["params"]
        assert p["ecog_convs_0"]["kernel"].shape == (3, 1, 1, 512)
        assert p["ecog_convs_0"]["bias"].shape == (512,)
