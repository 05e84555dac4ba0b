"""Per-chain compile-time configuration.

Mirrors the reference's circuits/config.rs (`TendermintConfig` trait :3-8,
`CelestiaConfig` :17-22, `Mocha4Config` :27-32).
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class TendermintConfig:
    chain_id: str
    skip_max: int = 100_800  # ~2 weeks at 12s blocks (reference config.rs:12)

    @property
    def chain_id_bytes(self) -> bytes:
        return self.chain_id.encode()


CELESTIA = TendermintConfig(chain_id="celestia")
MOCHA_4 = TendermintConfig(chain_id="mocha-4")
