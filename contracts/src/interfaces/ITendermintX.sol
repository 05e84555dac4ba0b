// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.19;

/// @notice Events and errors of the TendermintX light client.
/// @dev Capability parity with the reference interface
///      (/root/reference/contracts/src/interfaces/ITendermintX.sol:4-45).
interface ITendermintX {
    /// @notice Emitted when a step proof advances the head by one block.
    event HeadUpdate(uint64 indexed height, bytes32 headerHash);

    /// @notice Emitted when a step proof is requested from the prover.
    event StepRequested(uint64 indexed trustedBlock, bytes32 trustedHeader);

    /// @notice Emitted when a skip proof is requested from the prover.
    event SkipRequested(
        uint64 indexed trustedBlock,
        bytes32 trustedHeader,
        uint64 indexed targetBlock
    );

    error LatestHeaderNotFound();
    error TargetBlockNotInRange();
    error TrustedHeaderMismatch();

    /// @notice Header hash for a verified height (zero if unknown).
    function getHeaderHash(uint64 height) external view returns (bytes32);
}
