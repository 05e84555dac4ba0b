// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.19;

import {ITendermintX} from "./interfaces/ITendermintX.sol";
import {IProofGateway} from "./interfaces/IProofGateway.sol";

/// @notice Tendermint light client driven by TPU-generated ZK proofs.
/// @dev Capability parity with the reference light-client contract
///      (/root/reference/contracts/src/TendermintX.sol): storage layout
///      (:18-28), requestStep/requestSkip (:61-86,:127-143), and the
///      step/skip fulfillment callbacks (:91-123,:145-171). As in the
///      reference (:13 and circuit comment verify.rs:123-124), enforcing the
///      trusting period / unbonding window is this contract's
///      responsibility, bounded here by SKIP_MAX.
contract TendermintX is ITendermintX {
    /// @notice Longest allowed skip (~2 weeks of 12s blocks).
    uint64 public constant SKIP_MAX = 100800;

    /// @notice Gas limit forwarded to proof-fulfillment callbacks.
    uint32 public constant CALLBACK_GAS_LIMIT = 500000;

    /// @notice Proof verification gateway.
    address public gateway;

    /// @notice Latest verified block height.
    uint64 public latestBlock;

    /// @notice Verified header hashes by height.
    mapping(uint64 => bytes32) public blockHeightToHeaderHash;

    /// @notice Registered prover function ids.
    bytes32 public stepFunctionId;
    bytes32 public skipFunctionId;

    constructor(
        address _gateway,
        uint64 _genesisHeight,
        bytes32 _genesisHeader,
        bytes32 _stepFunctionId,
        bytes32 _skipFunctionId
    ) {
        gateway = _gateway;
        latestBlock = _genesisHeight;
        blockHeightToHeaderHash[_genesisHeight] = _genesisHeader;
        stepFunctionId = _stepFunctionId;
        skipFunctionId = _skipFunctionId;
    }

    function getHeaderHash(uint64 height) external view returns (bytes32) {
        return blockHeightToHeaderHash[height];
    }

    /// @notice Ask the prover network for a one-block step proof.
    function requestStep() external payable {
        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert LatestHeaderNotFound();
        IProofGateway(gateway).requestCall{value: msg.value}(
            stepFunctionId,
            abi.encodePacked(latestBlock, trustedHeader),
            address(this),
            abi.encodeCall(this.step, (latestBlock)),
            CALLBACK_GAS_LIMIT
        );
        emit StepRequested(latestBlock, trustedHeader);
    }

    /// @notice Ask the prover network for a skip proof to `targetBlock`.
    function requestSkip(uint64 targetBlock) external payable {
        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert LatestHeaderNotFound();
        if (
            targetBlock <= latestBlock + 1 ||
            targetBlock > latestBlock + SKIP_MAX
        ) revert TargetBlockNotInRange();
        IProofGateway(gateway).requestCall{value: msg.value}(
            skipFunctionId,
            abi.encodePacked(latestBlock, trustedHeader, targetBlock),
            address(this),
            abi.encodeCall(this.skip, (latestBlock, targetBlock)),
            CALLBACK_GAS_LIMIT
        );
        emit SkipRequested(latestBlock, trustedHeader, targetBlock);
    }

    /// @notice Fulfill a step: pulls the proven next header from the gateway.
    function step(uint64 trustedBlock) external {
        if (trustedBlock != latestBlock) revert TrustedHeaderMismatch();
        bytes32 trustedHeader = blockHeightToHeaderHash[trustedBlock];
        if (trustedHeader == bytes32(0)) revert LatestHeaderNotFound();
        bytes memory output = IProofGateway(gateway).verifiedCall(
            stepFunctionId,
            abi.encodePacked(trustedBlock, trustedHeader)
        );
        bytes32 nextHeader = abi.decode(output, (bytes32));
        uint64 nextBlock = trustedBlock + 1;
        blockHeightToHeaderHash[nextBlock] = nextHeader;
        latestBlock = nextBlock;
        emit HeadUpdate(nextBlock, nextHeader);
    }

    /// @notice Fulfill a skip: pulls the proven target header.
    function skip(uint64 trustedBlock, uint64 targetBlock) external {
        if (trustedBlock != latestBlock) revert TrustedHeaderMismatch();
        bytes32 trustedHeader = blockHeightToHeaderHash[trustedBlock];
        if (trustedHeader == bytes32(0)) revert LatestHeaderNotFound();
        if (
            targetBlock <= trustedBlock + 1 ||
            targetBlock > trustedBlock + SKIP_MAX
        ) revert TargetBlockNotInRange();
        bytes memory output = IProofGateway(gateway).verifiedCall(
            skipFunctionId,
            abi.encodePacked(trustedBlock, trustedHeader, targetBlock)
        );
        bytes32 targetHeader = abi.decode(output, (bytes32));
        blockHeightToHeaderHash[targetBlock] = targetHeader;
        latestBlock = targetBlock;
        emit HeadUpdate(targetBlock, targetHeader);
    }
}
